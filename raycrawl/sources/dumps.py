"""Dump-file sources: gzip/plain JSON-lines and CSV trees.

Reference analogs: the extension-dispatching line reader
(``Preprocess_scripts/Functions.py:20-33``), the recursive file-tree walk
(``Postprocess_scripts/Functions.py:166-171`` — Ray Data's glob expansion
replaces the hand-rolled BFS), and the JSON/py-repr line parser with
error skip (``PreprocessDump.py:203-211``).

``read_json_lines`` returns (records_dataset, with a ``_parse_error``
dead-letter column) — poison lines are never dropped silently, matching
the reference's ErrorFile behaviour but as a queryable column.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


def read_json_lines(paths: str | list[str], schema_cols: list[str]) -> ray.data.Dataset:
    """JSON-lines (gzip transparent via arrow) → one row per line with the
    requested columns (missing keys → null) + ``_parse_error`` flag."""
    txt = ray.data.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {c: [] for c in schema_cols}
        errs: list[bool] = []
        for line in t["text"].to_pylist():
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError("not an object")
            except (json.JSONDecodeError, ValueError):
                for c in schema_cols:
                    cols[c].append(None)
                errs.append(True)
                continue
            for c in schema_cols:
                v = rec.get(c)
                cols[c].append(None if v is None else str(v))
            errs.append(False)
        out = {c: pa.array(cols[c], pa.string()) for c in schema_cols}
        out["_parse_error"] = pa.array(errs, pa.bool_())
        return pa.table(out)

    return txt.map_batches(parse, batch_format="pyarrow")


def read_csv_tree(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """CSV file/tree source (S6) — Ray Data handles glob + parallel read."""
    return ray.data.read_csv(paths, **kwargs)
