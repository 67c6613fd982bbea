"""Local emulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() through DuckDB at a given sf, compare row count,
schema and order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount {len(ray_df)} vs {len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    if [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
        problems.append(f"dtypes {list(map(str, a.dtypes))} vs {list(map(str, b.dtypes))}")
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                if not np.allclose(a[c], b[c], rtol=0, atol=0, equal_nan=True):
                    problems.append(f"values differ in {c}")
            else:
                # Series.equals treats NaT/NaN as equal (like the driver's
                # value-hash of nulls); bare == would not
                if not a[c].reset_index(drop=True).equals(
                    b[c].reset_index(drop=True)
                ):
                    problems.append(f"values differ in {c}")
    return problems


def main():
    import ray
    import ray.data

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_ok = n_bad = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(ray_df)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: sql error: {e}")
            n_bad += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: {problems} ({dt:.1f}s)")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(ray_df)} rows ({dt:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
