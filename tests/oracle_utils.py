"""Shared oracle-parity harness for registry-query tests: DuckDB view
setup, dtype normalization and result coercion — one definition so the
suites cannot drift."""

import duckdb
import pandas as pd

from raycrawl.ops import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def oracle(name: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(REGISTRY[name]["sql"]).df()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def run_query(name: str, sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    got = REGISTRY[name]["fn"](sf_dir)
    if isinstance(got, ray.data.Dataset):
        return got.to_pandas()
    if isinstance(got, pa.Table):
        return got.to_pandas()
    return got
