"""Corpus-curation operators (ops/curation.py): DuckDB-oracle parity at
sf0.001 plus invariants — masking idempotence, explode row counts,
contamination symmetry, and packing chunk-budget compliance."""

import duckdb
import pandas as pd
import pytest

from raycrawl.ops import REGISTRY  # noqa: F401  (queries register on import)
from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

@pytest.mark.parametrize(
    "name",
    [
        "mask_terms_docs",
        "explode_doc_tokens",
        "benchmark_contamination",
        "pack_documents_to_chunks",
        "bpe_token_counts",
        "unigram_logprob_scores",
        "dsir_importance_weights",
        "ccnet_perplexity_buckets",
    ],
)
def test_oracle_parity(ray_session, name):
    pd.testing.assert_frame_equal(norm(run_query(name, SF)), norm(oracle(name, SF)))


def test_masking_is_idempotent_and_complete(ray_session):
    import re

    from raycrawl.ops.curation import _MASK_PATTERN

    got = run_query("mask_terms_docs", SF)
    pat = re.compile(_MASK_PATTERN)
    assert got["n_masked"].sum() > 0  # the vocabulary actually occurs
    assert not got["masked"].map(lambda s: bool(pat.search(s))).any()


def test_explode_preserves_token_totals(ray_session):
    got = run_query("explode_doc_tokens", SF)
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

    got = run_query("benchmark_contamination", SF)
    assert (got["doc_id"] % EVAL_MOD != 0).all()
    assert (got["n_shared"] > 0).all()


def test_packing_respects_budget_and_order(ray_session):
    from raycrawl.ops.curation import PACK_BUDGET

    got = run_query("pack_documents_to_chunks", SF).sort_values("doc_id")
    # chunk ids are non-decreasing in doc order and start at 0
    assert got["chunk_id"].iloc[0] == 0
    assert (got["chunk_id"].diff().dropna() >= 0).all()
    # each chunk's tokens stay under budget + one overhanging doc
    per = got.groupby("chunk_id").agg(
        tok=("n_tokens", "sum"), mx=("n_tokens", "max")
    )
    assert (per["tok"] <= PACK_BUDGET + per["mx"]).all()


def test_dsir_weights_separate_target_language(ray_session):
    """English documents must score higher on average than non-English
    ones — the whole point of the importance weight — and every doc gets
    exactly one weight."""
    import numpy as np

    got = run_query("dsir_importance_weights", SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    m = got.merge(docs, on="doc_id")
    assert len(got) == got["doc_id"].nunique()
    en = m.loc[m["lang"] == "en", "logw"].to_numpy()
    other = m.loc[m["lang"] != "en", "logw"].to_numpy()
    assert len(en) and len(other)
    assert np.mean(en) > np.mean(other)


def test_ccnet_buckets_are_per_language_thirds(ray_session):
    """Within every language the head/middle/tail split is as even as an
    exact tercile allows (sizes differ by ≤ tie-mass at the cutoffs) and
    bucket order respects avg_nll order."""
    got = run_query("ccnet_perplexity_buckets", SF)
    for lang, g in got.groupby("lang"):
        order = {"head": 0, "middle": 1, "tail": 2}
        g = g.sort_values("avg_nll")
        codes = g["bucket"].map(order).to_numpy()
        assert (codes[:-1] <= codes[1:]).all(), lang  # monotone in NLL
        sizes = g["bucket"].value_counts()
        assert sizes.get("head", 0) >= len(g) // 3  # ties only ever grow head-ward
