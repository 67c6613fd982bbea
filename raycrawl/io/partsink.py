"""Resumable partitioned parquet sink.

The 100-TB contract for output: one directory per partition key (input
shard / epoch / key range), never one giant file, and a failed run must be
able to skip partitions that already finished. Layout:

    out_dir/<col>=<value>/part-*.parquet     (hive-style, readable by
    out_dir/<col>=<value>/_SUCCESS            ray.data / duckdb / pyarrow)

``write_partitioned_resumable`` drops rows belonging to already-committed
partitions with a vectorized ``pc.is_in`` anti-filter (the committed key
set is scanned from _SUCCESS markers — driver-side, one stat per
partition, no data read), streams the remainder through Ray Data's
hive-partitioned ``write_parquet``, wipes any half-written uncommitted
directories first (crash cleanup), and commits each freshly written
partition with a _SUCCESS marker only after its files are fully on disk.

Scale notes: the committed-key set is one small scalar per partition —
at 10^5 partitions that is a trivial broadcast; the data path stays a
streaming Dataset end to end (no driver materialization). Partition
count should track input shards / key ranges, not row count.
"""

from __future__ import annotations

import os
import shutil

_SUCCESS = "_SUCCESS"


def _part_dirs(out_dir: str, col: str) -> list[str]:
    if not os.path.isdir(out_dir):
        return []
    return [d for d in sorted(os.listdir(out_dir)) if d.startswith(f"{col}=")]


def committed_keys(out_dir: str, col: str) -> list[str]:
    """Partition key values (as strings, hive-encoded) with a _SUCCESS
    marker — the partitions a resumed run may skip."""
    return [
        d.split("=", 1)[1]
        for d in _part_dirs(out_dir, col)
        if os.path.exists(os.path.join(out_dir, d, _SUCCESS))
    ]


def write_partitioned_resumable(ds, out_dir: str, col: str) -> dict:
    """Write ``ds`` as hive-partitioned parquet under ``out_dir``, skipping
    partitions already committed by a previous run. Returns
    ``{"skipped": [...], "written": [...]}`` (hive-encoded key strings).

    The partition column must be scalar (int/str). Rows of committed
    partitions are filtered out per batch (``pc.is_in`` against the
    committed-key array — vectorized, streamed); uncommitted partition
    dirs left over from a crash are removed before writing so partial
    files can never mix with fresh ones.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    done = committed_keys(out_dir, col)

    # crash cleanup: a dir without _SUCCESS is half-written — rewrite it
    for d in _part_dirs(out_dir, col):
        if not os.path.exists(os.path.join(out_dir, d, _SUCCESS)):
            shutil.rmtree(os.path.join(out_dir, d))

    if done:
        done_arr = pa.array(done, pa.string())

        def drop_done(t: pa.Table) -> pa.Table:
            keys = pc.cast(t[col], pa.string())
            return t.filter(pc.invert(pc.is_in(keys, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    before = set(_part_dirs(out_dir, col))
    ds.write_parquet(out_dir, partition_cols=[col])

    written = []
    for d in _part_dirs(out_dir, col):
        marker = os.path.join(out_dir, d, _SUCCESS)
        if d not in before or not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("")
            written.append(d.split("=", 1)[1])
    return {"skipped": done, "written": written}


def read_partitioned(out_dir: str, col: str, columns: list[str] | None = None):
    """Committed partitions only, as a streaming Dataset (hive column
    re-materialized by the parquet reader)."""
    import ray.data

    paths = [
        os.path.join(out_dir, f"{col}={k}") for k in committed_keys(out_dir, col)
    ]
    # file_extensions: skip the _SUCCESS markers living next to the data
    return ray.data.read_parquet(
        paths, columns=columns, file_extensions=["parquet"]
    )
