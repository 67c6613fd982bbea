"""Round-3 session-6 operators: TPC-H-shaped large-join analytics
(Q13 order-count distribution, Q14 promo share, Q17 small-quantity
revenue, Q18 large-volume customers, Q8 market share) — oracle parity
plus structural invariants the SQL comparison can't express."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = [
    "customer_order_count_distribution",
    "promo_revenue_by_month",
    "small_quantity_part_revenue",
    "large_volume_customers",
    "nation_yearly_market_share",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_order_count_distribution_totals(ray_session):
    """Histogram masses reconcile with the parquet footers: customers
    sum to |customer|, customer-weighted order counts sum to |orders|."""
    import pyarrow.dataset as pads

    df = run_query("customer_order_count_distribution", SF)
    n_cust = pads.dataset(f"{SF}/customer.parquet").count_rows()
    n_orders = pads.dataset(f"{SF}/orders.parquet").count_rows()
    assert int(df["n_customers"].sum()) == n_cust
    assert int((df["n_orders"] * df["n_customers"]).sum()) == n_orders


def test_market_share_sums_to_100_per_year(ray_session):
    df = run_query("nation_yearly_market_share", SF)
    for _, g in df.groupby("yr"):
        assert g["share"].sum() == pytest.approx(100.0, abs=1e-2)


def test_large_volume_customers_threshold(ray_session):
    """Every reported order really exceeds 300 total quantity, and no
    qualifying order is missing (recomputed locally from lineitem)."""
    import duckdb

    df = run_query("large_volume_customers", SF)
    want = duckdb.connect().execute(
        f"SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
        f" GROUP BY 1 HAVING SUM(l_quantity) > 300"
    ).df()
    want.columns = ["ok", "tq"]
    got = df[["o_orderkey", "total_qty"]].sort_values("o_orderkey")
    want = want.sort_values("ok")
    assert np.array_equal(got["o_orderkey"].to_numpy(), want["ok"].to_numpy())
    assert np.array_equal(got["total_qty"].to_numpy(), want["tq"].to_numpy())
    assert (df["total_qty"] > 300).all()
