"""Corpus-curation operators (ops/curation.py): DuckDB-oracle parity at
sf0.001 plus invariants — masking idempotence, explode row counts,
contamination symmetry, and packing chunk-budget compliance."""

import duckdb
import pandas as pd
import pytest

from raycrawl.ops import REGISTRY

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(REGISTRY[name]["sql"]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _run(name: str) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    got = REGISTRY[name]["fn"](SF)
    if isinstance(got, ray.data.Dataset):
        return got.to_pandas()
    if isinstance(got, pa.Table):
        return got.to_pandas()
    return got


@pytest.mark.parametrize(
    "name",
    [
        "mask_terms_docs",
        "explode_doc_tokens",
        "benchmark_contamination",
        "pack_documents_to_chunks",
        "bpe_token_counts",
    ],
)
def test_oracle_parity(ray_session, name):
    pd.testing.assert_frame_equal(_norm(_run(name)), _norm(_oracle(name)))


def test_masking_is_idempotent_and_complete(ray_session):
    import re

    from raycrawl.ops.curation import _MASK_PATTERN

    got = _run("mask_terms_docs")
    pat = re.compile(_MASK_PATTERN)
    assert got["n_masked"].sum() > 0  # the vocabulary actually occurs
    assert not got["masked"].map(lambda s: bool(pat.search(s))).any()


def test_explode_preserves_token_totals(ray_session):
    got = _run("explode_doc_tokens")
    want = duckdb.sql(
        f"""SELECT SUM(len(string_split_regex(trim(text), '\\s+')))
            FROM read_parquet('{SF}/documents.parquet')"""
    ).fetchone()[0]
    assert len(got) == want
    # positions are 1..n_tokens per doc
    per = got.groupby("doc_id")["pos"]
    assert (per.min() == 1).all()
    assert (per.max() == per.count()).all()


def test_contamination_excludes_eval_split(ray_session):
    from raycrawl.ops.curation import EVAL_MOD

    got = _run("benchmark_contamination")
    assert (got["doc_id"] % EVAL_MOD != 0).all()
    assert (got["n_shared"] > 0).all()


def test_packing_respects_budget_and_order(ray_session):
    from raycrawl.ops.curation import PACK_BUDGET

    got = _run("pack_documents_to_chunks").sort_values("doc_id")
    # chunk ids are non-decreasing in doc order and start at 0
    assert got["chunk_id"].iloc[0] == 0
    assert (got["chunk_id"].diff().dropna() >= 0).all()
    # each chunk's tokens stay under budget + one overhanging doc
    per = got.groupby("chunk_id").agg(
        tok=("n_tokens", "sum"), mx=("n_tokens", "max")
    )
    assert (per["tok"] <= PACK_BUDGET + per["mx"]).all()
