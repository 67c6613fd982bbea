"""Session-8 batch E: Benford digit audit, hourly autocorrelation, and the
crawl-budget audit query — oracle parity plus ground truths."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = ["order_value_benford_digits", "event_hourly_autocorr"]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_benford_shares_sum_to_one(ray_session):
    df = run_query("order_value_benford_digits", SF)
    assert abs(df["share"].sum() - 1.0) < 1e-4
    assert sorted(df["digit"]) == list(range(1, 10))
    # expectation column is the Benford law itself
    want = np.log10(1.0 + 1.0 / df["digit"].to_numpy(np.float64))
    assert np.allclose(df["benford_expected"], want, atol=1e-6)


def test_autocorr_matches_numpy(ray_session):
    """Recompute lag-1 autocorrelation per type with np.corrcoef over the
    hourly series (present hours only, matching the LAG definition)."""
    import duckdb

    got = run_query("event_hourly_autocorr", SF).set_index("event_type")
    h = duckdb.sql(
        f"SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2 "
        f"ORDER BY 1, 2"
    ).df()
    for et, g in h.groupby("event_type"):
        n = g["n"].to_numpy(np.float64)
        if len(n) < 2:
            assert et not in got.index
            continue
        r = np.corrcoef(n[1:], n[:-1])[0, 1]
        assert abs(got.loc[et, "autocorr_lag1"] - r) < 1e-6
        assert got.loc[et, "n_pairs"] == len(n) - 1
        assert -1.0 <= got.loc[et, "autocorr_lag1"] <= 1.0


def test_quota_audit_invariants(ray_session):
    """The audit's own numbers must prove the cap: max host rows ≤ quota,
    and the quota genuinely fired (denied or dropped > 0) on a web whose
    hosts have more pages than the cap."""
    df = run_query("crawl_quota_audit", SF)
    row = df.iloc[0]
    assert row["max_host_rows"] <= row["quota"]
    assert row["fetched_rows"] <= row["n_hosts"] * row["quota"]
    assert row["quota_denied"] + row["quota_dropped"] > 0
    assert row["n_hosts_at_cap"] >= 1


def test_jaccard_and_entropy_match_oracle(ray_session):
    for name in ("event_type_user_jaccard", "nation_revenue_entropy"):
        got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jaccard_bounds_and_symmetric_base(ray_session):
    df = run_query("event_type_user_jaccard", SF)
    assert ((df["jaccard"] >= 0) & (df["jaccard"] <= 1)).all()
    assert (df["n_both"] <= df["n_either"]).all()
    assert (df["type_a"] < df["type_b"]).all()  # each unordered pair once


def test_entropy_bounds(ray_session):
    row = run_query("nation_revenue_entropy", SF).iloc[0]
    assert 0 <= row["normalized_entropy"] <= 1
    assert abs(
        row["revenue_entropy"]
        - row["normalized_entropy"] * np.log(row["n_nations"])
    ) < 2e-6
