"""Session-8 batch D: Q20-shape dominant suppliers, Q16-shape distinct
supplier matrix, peak-hour argmax — oracle parity plus structural
invariants."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = [
    "excess_quantity_suppliers",
    "brand_type_supplier_counts",
    "event_peak_hour_by_type",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dominance_is_nontrivial_and_bounded(ray_session):
    """The 1/8-share rule must fire (non-empty) but can crown at most 7
    dominators per part — so Σ n_parts_dominated ≤ 7 × |small parts|."""
    import duckdb

    df = run_query("excess_quantity_suppliers", SF)
    assert len(df) > 0
    n_parts = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/part.parquet') "
        f"WHERE p_name LIKE 'small%'"
    ).fetchone()[0]
    assert df["n_parts_dominated"].sum() <= 7 * n_parts
    assert df["s_suppkey"].is_unique


def test_q16_counts_bounded_by_suppliers(ray_session):
    import duckdb

    df = run_query("brand_type_supplier_counts", SF)
    n_sup = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/supplier.parquet')"
    ).fetchone()[0]
    assert (df["supplier_cnt"] >= 1).all()
    assert (df["supplier_cnt"] <= n_sup).all()
    assert not (df["p_brand"] == "Brand#1").any()


def test_peak_hour_is_argmax(ray_session):
    """Recompute per-type hourly histograms and confirm each reported
    (peak_hour, n_events) is the true maximum with lowest-hour ties."""
    import duckdb

    df = run_query("event_peak_hour_by_type", SF).set_index("event_type")
    h = duckdb.sql(
        f"SELECT event_type, EXTRACT(hour FROM ts) AS hr, count(*) AS n "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).df()
    for et, g in h.groupby("event_type"):
        g = g.sort_values(["n", "hr"], ascending=[False, True])
        assert df.loc[et, "peak_hour"] == int(g["hr"].iloc[0])
        assert df.loc[et, "n_events"] == int(g["n"].iloc[0])
