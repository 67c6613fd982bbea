"""Shared helpers for the analytics operators over the testdata tables."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read (only requested columns leave storage)."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def md5_u64_le(s: str) -> int:
    """Little-endian first-8-bytes of md5 — THE oracle-load-bearing hash
    convention (== DuckDB ``md5_number_upper``). Single definition shared
    by hash sampling, stratified sampling, shingling, simhash and the
    quantile bin keys so the byte order can never silently diverge."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def round_half_away(x, nd: int):
    """Round half AWAY from zero, element-wise — DuckDB ROUND's tie rule
    (verified on DOUBLE: 0.5→1, 2.5→3, -2.5→-3). numpy/Python round are
    half-to-even, which diverges from every SQL oracle on exact .5
    boundaries; any float destined for a ROUND()-compared column must go
    through this."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** nd
    return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)


def round_cols(ds: ray.data.Dataset, spec: dict[str, int]) -> ray.data.Dataset:
    """Round float columns to fixed decimals so Ray and DuckDB value-hashes
    agree despite summation-order float jitter."""

    def _round(t: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            if col in t.column_names:
                i = t.column_names.index(col)
                t = t.set_column(
                    i, col, pc.round(pc.cast(t[col], pa.float64()), ndigits=nd)
                )
        return t

    return ds.map_batches(_round, batch_format="pyarrow")


def cast_cols(ds: ray.data.Dataset, spec: dict[str, pa.DataType]) -> ray.data.Dataset:
    def _cast(t: pa.Table) -> pa.Table:
        for col, typ in spec.items():
            if col in t.column_names:
                i = t.column_names.index(col)
                t = t.set_column(i, col, pc.cast(t[col], typ))
        return t

    return ds.map_batches(_cast, batch_format="pyarrow")
