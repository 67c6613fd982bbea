"""Session-8 batch A: the remaining classic TPC-H join/agg shapes —
Q3 shipping-priority top-k, Q4 EXISTS-as-max semi-join, Q10 returned-item
report, Q19 disjunctive broadcast-join revenue, nation YoY growth (LAG),
supplier dense-rank — oracle parity plus broadcast/join path equivalence
for every adaptive gate."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = [
    "shipping_priority_topk",
    "order_priority_exists_check",
    "returned_item_report",
    "disjunctive_part_revenue",
    "nation_yoy_revenue_growth",
    "supplier_rank_in_nation",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


GATED = [
    ("shipping_priority_topk", "broadcast", "join"),
    ("order_priority_exists_check", "broadcast", "join"),
    ("disjunctive_part_revenue", "broadcast", "join"),
    ("nation_yoy_revenue_growth", "broadcast", "join"),
    ("returned_item_report", "broadcast", "join"),
]


@pytest.mark.parametrize("name,small,big", GATED)
def test_gated_paths_equivalent(ray_session, name, small, big):
    """Forcing the broadcast gate to 0 must flip the op onto its
    distributed join branch and produce identical rows."""
    from raycrawl.ops import relops2
    from raycrawl.ops.common import PATH_LOG

    def run(**kw):
        out = fn(SF, **kw)
        return norm(out.to_pandas() if not isinstance(out, pd.DataFrame) else out)

    fn = getattr(relops2, name)
    a = run()
    assert PATH_LOG[name] == small
    b = run(broadcast_max=0)
    assert PATH_LOG[name] == big
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_q4_exists_equals_direct_exists(ray_session):
    """max(l_shipdate) > deadline must be exactly EXISTS(any late line) —
    recompute with a direct per-line EXISTS in DuckDB."""
    import duckdb

    got = norm(run_query("order_priority_exists_check", SF))
    want = norm(
        duckdb.sql(
            f"""
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
            FROM read_parquet('{SF}/orders.parquet')
            WHERE EXISTS (
              SELECT 1 FROM read_parquet('{SF}/lineitem.parquet')
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
            GROUP BY 1
            """
        ).df()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q3_topk_is_globally_correct(ray_session):
    """The per-block top-k merge must equal the true global top-10 —
    recompute the full ranking without LIMIT and take its head."""
    import duckdb

    from raycrawl.ops.relops2 import _Q3_CUT, _Q3_SEG

    got = run_query("shipping_priority_topk", SF)
    full = duckdb.sql(
        f"""
        SELECT o_orderkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS cents
        FROM read_parquet('{SF}/customer.parquet') c
          JOIN read_parquet('{SF}/orders.parquet') o ON c_custkey = o_custkey
          JOIN read_parquet('{SF}/lineitem.parquet') l
            ON l_orderkey = o_orderkey
        WHERE c_mktsegment = '{_Q3_SEG}'
          AND o_orderdate < DATE '{_Q3_CUT}'
          AND l_shipdate > DATE '{_Q3_CUT}'
        GROUP BY 1 ORDER BY cents DESC, o_orderkey
        """
    ).df()
    assert list(got["o_orderkey"]) == list(full["o_orderkey"].head(10))
    assert np.allclose(
        got["revenue"].to_numpy(),
        full["cents"].head(10).to_numpy(np.float64) / 100.0,
    )


def test_supplier_rank_dense_and_gaps(ray_session):
    """dense_rank starts at 1 per nation, never skips, and gap_to_prev is
    non-negative with exactly one zero-gap row (the leader) per nation
    unless balances tie."""
    df = run_query("supplier_rank_in_nation", SF)
    for _, g in df.groupby("n_name"):
        ranks = np.sort(g["bal_rank"].unique())
        assert ranks[0] == 1
        assert (np.diff(ranks) == 1).all()
        assert (g["gap_to_prev"] >= 0).all()
