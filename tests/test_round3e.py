"""Session-5 operator additions: cohort retention (bucketed
high-cardinality customer groupby → bounded cohort matrix) and
supplier Pareto/ABC share (bounded partial sums + exact integer-cent
cumulative pass), each pinned to its DuckDB oracle plus structural
properties the value-hash cannot see."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = ["customer_cohort_retention", "supplier_pareto_share",
           "nation_trade_balance", "orders_seasonality_index"]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cohort_matrix_structure(ray_session):
    """Offset-0 cell of each cohort == cohort size (every customer
    orders in their own first year); retention never exceeds it; the
    cohort sizes sum to the distinct-customer count."""
    import duckdb

    df = run_query("customer_cohort_retention", SF)
    base = df[df["offset_years"] == 0].set_index("cohort_year")[
        "n_customers"
    ]
    for cy, g in df.groupby("cohort_year"):
        assert (g["n_customers"] <= base[cy]).all()
        assert (g["offset_years"] >= 0).all()
    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert int(base.sum()) == n_cust


def test_pareto_share_structure(ray_session):
    """cum_share is strictly increasing to 1.0 in (revenue desc,
    suppkey) order, and in_top80 is exactly the prefix of suppliers
    whose PRECEDING cumulative share is < 0.8."""
    df = run_query("supplier_pareto_share", SF)
    cents = np.round(df["revenue"].to_numpy() * 100).astype(np.int64)
    order = np.lexsort((df["l_suppkey"].to_numpy(), -cents))
    df = df.iloc[order].reset_index(drop=True)
    cs = df["cum_share"].to_numpy()
    assert (np.diff(cs) > 0).all()
    assert cs[-1] == pytest.approx(1.0, abs=1e-6)
    prev_share = np.concatenate([[0.0], np.cumsum(cents)[:-1]]) / cents.sum()
    assert (df["in_top80"].to_numpy() == (prev_share < 0.8)).all()
    # flags form a prefix: once False, never True again
    flags = df["in_top80"].to_numpy()
    assert not flags[np.argmin(flags):].any() or flags.all()


def test_combine_small_tolerates_empty_pandas_blocks(ray_session):
    """Regression (caught by the sf1.0 smoke): a pandas-block stage
    upstream can leak EMPTY pandas blocks through a pyarrow map_batches
    (Ray skips the UDF on empty blocks), and combine_small must
    normalize them instead of crashing on .num_rows."""
    import pyarrow as pa
    import ray

    from raycrawl.ops.common import combine_small

    ds = ray.data.from_pandas([
        pd.DataFrame({"k": [1, 1], "n": [2, 3]}),
        pd.DataFrame({"k": pd.Series([], dtype="int64"),
                      "n": pd.Series([], dtype="int64")}),
    ])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "k").aggregate([("n", "sum")])
        return g.rename_columns(["k", "n"])

    out = combine_small(
        ds.map_batches(partial, batch_size=None, batch_format="pyarrow"),
        lambda t: pa.TableGroupBy(t, "k").aggregate([("n", "sum")])
        .rename_columns(["k", "n"]),
    )
    assert out.to_pydict() == {"k": [1], "n": [5]}
