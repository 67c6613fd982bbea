"""Sketch/quantile operators + an additional large-large join.

The reference has no approximate aggregates (SURVEY §2.5); these add the
training-pipeline staples: mergeable HyperLogLog distinct-count (per-batch
sketches merged in a tiny second stage — the canonical mergeable-sketch
shape) and histogram-based exact quantiles (groupby on rounded values →
small cumulative table), plus one more ``Dataset.join`` exercise.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from .common import table
from .queries import register


# --------------------------------------------------------------------------
# large-large hash join #2: order rows enriched with customer nation,
# filtered, counted per nation (Dataset.join keyed on custkey)
@register(
    "orders_per_nation_joined",
    sql="""
    SELECT c_nationkey, count(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    GROUP BY c_nationkey
    """,
)
def orders_per_nation_joined(sf_dir: str):
    orders = table(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 100000"
    )
    cust = table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    return joined.groupby("c_nationkey").aggregate(Count(alias_name="n"))


# --------------------------------------------------------------------------
# exact quantiles via value histogram: groupby(rounded value) → tiny
# cumulative table on the driver; identical construction in SQL so the
# discrete-quantile convention matches exactly on both sides
_QS = (0.5, 0.9, 0.99)


@register(
    "event_value_quantiles",
    sql=f"""
    WITH h AS (SELECT ROUND(value, 2) AS v, count(*) AS n FROM events GROUP BY 1),
    t AS (SELECT SUM(n) AS tot FROM h),
    c AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM h)
    {" UNION ALL ".join(
        f"SELECT 'p{int(q * 100)}' AS quantile, "
        f"(SELECT min(v) FROM c, t WHERE cum >= {q} * tot) AS value"
        for q in _QS
    )}
    """,
)
def event_value_quantiles(sf_dir: str):
    ds = table(sf_dir, "events", ["value"])

    def rounded(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": pc.round(t["value"], ndigits=2,
                           round_mode="half_towards_infinity")}
        )

    hist = (
        ds.map_batches(rounded, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # ≤ distinct rounded values — small
        .sort_values("v")
    )
    tot = hist["n"].sum()
    cum = hist["n"].cumsum()
    out = []
    for q in _QS:
        idx = (cum >= q * tot).idxmax()
        out.append({"quantile": f"p{int(q * 100)}", "value": float(hist.loc[idx, "v"])})
    return pd.DataFrame(out)


# --------------------------------------------------------------------------
# HyperLogLog distinct count: one 2^12-register sketch per batch, merged in
# a tiny reduce — the mergeable-sketch pattern (rows-only: approximate;
# pytest bounds the error against the exact count)
HLL_P = 12
HLL_M = 1 << HLL_P


def _hll_sketch(values) -> np.ndarray:
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(hashlib.sha1(str(v).encode()).digest()[:8], "big")
        idx = h & (HLL_M - 1)
        w = h >> HLL_P
        rank = (64 - HLL_P) - w.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)  # small-range correction
    return float(est)


@register("hll_distinct_users", sql=None)
def hll_distinct_users(sf_dir: str):
    ds = table(sf_dir, "events", ["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        regs = _hll_sketch(t["user_id"].to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    merged = np.zeros(HLL_M, dtype=np.uint8)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged = np.maximum(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return pd.DataFrame(
        [{"metric": "hll_distinct_user_ids", "estimate": round(hll_estimate(merged), 1)}]
    )
