"""Session-6 batch C: winsorized mean from exact discrete quantiles,
regression-by-group from streaming moments, PCA variance spectrum from
covariance partials — oracle parity plus the numeric ground truths the
value-hash cannot see."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = [
    "event_value_winsorized_mean",
    "qty_price_regression_by_flag",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_winsorized_quantiles_match_numpy(ray_session):
    """The two-pass discrete quantiles must equal the rank-
    ceil(q*n)-1 element of the sorted cent values (DuckDB quantile_disc
    convention), and the clipped mean must match a direct recompute."""
    import math

    import duckdb

    df = run_query("event_value_winsorized_mean", SF).set_index("event_type")
    raw = duckdb.sql(
        f"SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    for et, g in raw.groupby("event_type"):
        v = np.sort(g["c"].to_numpy(np.int64))
        n = len(v)
        lo = int(v[max(math.ceil(0.05 * n) - 1, 0)])
        hi = int(v[max(math.ceil(0.95 * n) - 1, 0)])
        assert df.loc[et, "p05"] == lo / 100.0
        assert df.loc[et, "p95"] == hi / 100.0
        want = np.clip(v, lo, hi).sum() / (100.0 * n)
        assert abs(df.loc[et, "winsorized_mean"] - want) < 5.1e-5
        assert df.loc[et, "n"] == n


def test_regression_matches_numpy_polyfit(ray_session):
    """Slope/intercept from moments must agree with numpy's least-squares
    fit on the raw (quantity, cents) points to the op's rounding."""
    import duckdb

    df = run_query("qty_price_regression_by_flag", SF).set_index(
        ["l_returnflag", "l_linestatus"]
    )
    raw = duckdb.sql(
        f"SELECT l_returnflag, l_linestatus, l_quantity AS x, "
        f"CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    for key, g in raw.groupby(["l_returnflag", "l_linestatus"]):
        slope, intercept = np.polyfit(
            g["x"].to_numpy(np.float64), g["y"].to_numpy(np.float64), 1
        )
        assert abs(df.loc[key, "slope"] - slope) < 1e-3
        assert abs(df.loc[key, "intercept"] - intercept) < 1e-2
        assert 0.0 <= df.loc[key, "r2"] <= 1.0


def test_pca_spectrum_matches_numpy(ray_session):
    """Distributed covariance partials must reproduce numpy's direct
    eigendecomposition of the full embedding matrix."""
    import duckdb

    from raycrawl.ops.mlprep import PCA_TOP

    df = run_query("embedding_pca_variance_spectrum", SF)
    emb = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    assert len(df) == min(PCA_TOP, m.shape[1])
    np.testing.assert_allclose(
        df["eigenvalue"].to_numpy(), evals[: len(df)], atol=1e-7
    )
    np.testing.assert_allclose(
        df["explained_ratio"].to_numpy(),
        (evals[: len(df)] / evals.sum()),
        atol=1e-5,
    )
    cum = df["cum_explained"].to_numpy()
    assert (np.diff(cum) > 0).all() and cum[-1] <= 1.0 + 1e-9


def test_churned_pairs_match_oracle(ray_session):
    got = norm(run_query("churned_user_event_types", SF))
    want = norm(oracle("churned_user_event_types", SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_churned_pairs_are_genuinely_absent_late(ray_session):
    """Every reported pair has zero events at-or-after the exact integer-
    microsecond cutoff, and at least one before it."""
    import duckdb

    df = run_query("churned_user_event_types", SF)
    ev = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    lo, hi = int(ev["us"].min()), int(ev["us"].max())
    cutoff = lo + (hi - lo) * 9 // 10
    for _, r in df.iterrows():
        g = ev[(ev["user_id"] == r["user_id"])
               & (ev["event_type"] == r["event_type"])]
        assert (g["us"] < cutoff).sum() == r["n_early"] > 0
        assert (g["us"] >= cutoff).sum() == 0


def test_cube_matches_oracle_and_margins_fold(ray_session):
    got = norm(run_query("doc_lang_source_cube", SF))
    want = norm(oracle("doc_lang_source_cube", SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # margins are exact folds of the finest cells
    df = run_query("doc_lang_source_cube", SF)
    base = df[(df["lang"] != "ALL") & (df["source"] != "ALL")]
    total = df[(df["lang"] == "ALL") & (df["source"] == "ALL")]
    assert int(total["n"].iloc[0]) == int(base["n"].sum())
    assert int(total["chars"].iloc[0]) == int(base["chars"].sum())
    for lang, g in base.groupby("lang"):
        m = df[(df["lang"] == lang) & (df["source"] == "ALL")]
        assert int(m["n"].iloc[0]) == int(g["n"].sum())
