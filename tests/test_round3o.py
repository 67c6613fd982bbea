"""Session-9 batch: sliding-window distinct users, first-touch
attribution, rolling 30-day revenue — oracle parity plus window
ground truths recomputed with plain pandas."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = [
    "rolling_7d_distinct_users",
    "first_touch_event_share",
    "orders_rolling_30d_revenue",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_distinct_matches_bruteforce(ray_session):
    """Every output day's count equals a brute-force pandas recount of
    distinct users in its trailing 7-day window."""
    got = run_query("rolling_7d_distinct_users", SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    ev["day"] = ev["ts"].dt.floor("D")
    for _, row in got.iterrows():
        lo = row["day"] - pd.Timedelta(days=6)
        want = ev.loc[
            (ev["day"] >= lo) & (ev["day"] <= row["day"]), "user_id"
        ].nunique()
        assert row["n_users"] == want, str(row["day"])
    # the window actually slides: some day exceeds its single-day count
    single = ev.groupby("day")["user_id"].nunique()
    assert (got.set_index("day")["n_users"] > single).any()


def test_first_touch_shares_sum_to_one(ray_session):
    got = run_query("first_touch_event_share", SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert got["n_users"].sum() == ev["user_id"].nunique()
    assert abs(got["share"].sum() - 1.0) < 1e-4


def test_rolling_revenue_window_identity(ray_session):
    """rolling_30d ≥ revenue everywhere, equality exactly where the
    trailing 29 days are empty of orders."""
    got = run_query("orders_rolling_30d_revenue", SF).sort_values("day")
    assert (got["rolling_30d"] >= got["revenue"] - 1e-9).all()
    day = got["day"].to_numpy()
    prev_in_window = [
        ((day < d) & (day >= d - np.timedelta64(29, "D"))).any() for d in day
    ]
    flat = np.isclose(got["rolling_30d"], got["revenue"])
    assert (flat == ~np.array(prev_in_window)).all()


@pytest.mark.parametrize(
    "name", ["suppliers_covering_brand", "part_type_price_skyline"]
)
def test_division_and_skyline_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_skyline_sweep_equals_bruteforce(ray_session):
    """The O(n log n) sweep equals the quadratic dominance definition on
    every type group."""
    got = run_query("part_type_price_skyline", SF)
    parts = pd.read_parquet(f"{SF}/part.parquet")
    for ptype, g in parts.groupby("p_type"):
        pr = g["p_retailprice"].to_numpy()
        sz = g["p_size"].to_numpy()
        keep = []
        for i in range(len(g)):
            dominated = (
                (pr <= pr[i]) & (sz >= sz[i]) & ((pr < pr[i]) | (sz > sz[i]))
            ).any()
            if not dominated:
                keep.append(g["p_partkey"].iloc[i])
        assert sorted(keep) == sorted(
            got.loc[got["p_type"] == ptype, "p_partkey"]
        ), ptype


def test_division_total_and_flag_consistency(ray_session):
    got = run_query("suppliers_covering_brand", SF)
    parts = pd.read_parquet(f"{SF}/part.parquet")
    total = (parts["p_brand"] == "Brand#13").sum()
    assert (got["n_covered"] <= total).all()
    assert (got["covers_all"] == (got["n_covered"] == total)).all()
