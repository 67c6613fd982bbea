"""Streaming-shaped temporal operators over the ``events`` log.

Ray Data has no event-time window engine; these express the standard
stream patterns as partition-by-key + in-group ordered pandas (the
documented Ray Data idiom for stream-shaped references): as-of join
(latest prior event), gap-based sessionization, and a per-key running
aggregate. Each states its ordering assumption: events are processed per
``user_id`` ordered by ``(ts, event_id)`` — a total, deterministic order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import combine_small, round_half_away, table
from .queries import register


# --------------------------------------------------------------------------
# as-of join: for every event, the timestamp of the same user's most
# recent STRICTLY EARLIER 'purchase' event (NULL if none) — the classic
# enrich-with-latest-state lookup (merge_asof inside per-user groups)
@register(
    "asof_last_purchase",
    sql="""
    SELECT e.event_id, max(p.ts) AS last_purchase_ts
    FROM events e LEFT JOIN events p
      ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts < e.ts
    GROUP BY e.event_id
    """,
)
def asof_last_purchase(sf_dir: str):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        purchases = g[g["event_type"] == "purchase"][["ts"]].rename(
            columns={"ts": "last_purchase_ts"}
        )
        out = pd.merge_asof(
            g[["event_id", "ts"]],
            purchases.assign(_p=purchases["last_purchase_ts"]),
            left_on="ts",
            right_on="last_purchase_ts",
            direction="backward",
            allow_exact_matches=False,  # strictly earlier
        )
        return out[["event_id", "last_purchase_ts"]]

    return ds.groupby("user_id").map_groups(asof, batch_format="pandas")


# --------------------------------------------------------------------------
# gap-based sessionization: a new session starts when the gap to the
# user's previous event exceeds 30 minutes; emits per-user session counts
# and the longest session length (#events)
@register(
    "user_sessions_30m",
    sql="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (SELECT * FROM g)),
    sizes AS (
      SELECT user_id, session_id, count(*) AS sz FROM s GROUP BY 1, 2)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(sz) AS BIGINT) AS max_session_events
    FROM sizes GROUP BY user_id
    """,
)
def user_sessions_30m(sf_dir: str):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=30)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        new = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        sid = new.cumsum()
        sizes = sid.value_counts()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(sid.max())],
                "max_session_events": [int(sizes.max())],
            }
        )

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")


# --------------------------------------------------------------------------
# per-key running aggregate (ordered window): each event's cumulative
# count of prior same-user events — a running-state column
@register(
    "running_event_index",
    sql="""
    SELECT event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1 AS BIGINT)
             AS prior_events
    FROM events
    """,
)
def running_event_index(sf_dir: str):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {"event_id": g["event_id"], "prior_events": range(len(g))}
        ).astype({"prior_events": "int64"})

    return ds.groupby("user_id").map_groups(running, batch_format="pandas")


# --------------------------------------------------------------------------
# SLIDING event-time window: per event, the count of the same user's
# events with ts in [ts − 30 min, ts] (value-range frame, ties included —
# exactly SQL's RANGE BETWEEN ... PRECEDING AND CURRENT ROW). Vectorized
# per group with two searchsorted passes; the partition key is the same
# user_id used by every other temporal operator.
@register(
    "sliding_window_counts",
    sql="""
    SELECT event_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                               RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS n_in_window
    FROM events
    """,
)
def sliding_window_counts(sf_dir: str):
    import numpy as np

    ds = table(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=30)

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy()
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - gap.to_timedelta64(), side="left")
        return pd.DataFrame(
            {"event_id": g["event_id"], "n_in_window": (hi - lo).astype("int64")}
        )

    return ds.groupby("user_id").map_groups(window, batch_format="pandas")


# --------------------------------------------------------------------------
# per-user inter-arrival statistics: event count, mean and max gap between
# consecutive events in MICROSECONDS (integer microseconds keep every sum
# exact below 2^53, so the Ray float mean is bit-identical to DuckDB's and
# ROUND-half-away agrees on both sides — no float-jitter tolerance needed)
@register(
    "user_interarrival_stats",
    sql="""
    WITH g AS (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(ROUND(AVG(gap_us), 0) AS BIGINT) AS avg_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def user_interarrival_stats(sf_dir: str):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(
        interarrival_group_stats, batch_format="pandas"
    )


def interarrival_group_stats(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
    ns = g["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
    gaps_us = np.diff(ns) // 1000  # exact integer microseconds
    if len(gaps_us):
        avg = int(round_half_away(gaps_us.sum() / len(gaps_us), 0))
        mx = int(gaps_us.max())
    else:  # single-event user: AVG/MAX over zero rows -> NULL
        avg = mx = None
    return pd.DataFrame(
        {
            "user_id": [g["user_id"].iloc[0]],
            "n_events": pd.array([len(g)], dtype="int64"),
            "avg_gap_us": pd.array([avg], dtype="Int64"),
            "max_gap_us": pd.array([mx], dtype="Int64"),
        }
    )


# --------------------------------------------------------------------------
# ROWS-frame rolling window: mean of each user's last 5 event values
# (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW). The 5-term sum is built from
# explicitly shifted arrays added left-to-right — the same association
# order as a windowed scan — instead of pandas' sliding running sum, whose
# add/subtract drift could diverge from the oracle in the last ulp.
@register(
    "rolling_value_mean_5",
    sql="""
    SELECT event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS rolling_mean_5
    FROM events
    """,
)
def rolling_value_mean_5(sf_dir: str):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    W = 5

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = g["value"].to_numpy(dtype=np.float64)
        n = len(v)
        acc = v.copy()
        cnt = np.ones(n)
        for k in range(1, W):
            acc[k:] += v[:-k] if k else v
            cnt[k:] += 1
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "rolling_mean_5": round_half_away(acc / cnt, 6),
            }
        )

    return ds.groupby("user_id").map_groups(roll, batch_format="pandas")


# --------------------------------------------------------------------------
# event-type transition matrix: global counts of (previous event_type ->
# event_type) pairs within each user's (ts, event_id)-ordered stream — the
# Markov-chain building block. Per-user pair emission shuffles once on
# user_id (map_groups); the pair alphabet is fixed (|types|^2 ≈ tens), so
# the final count is a per-block partial + one local combine, no second
# shuffle at any input scale.
@register(
    "event_type_transitions",
    sql="""
    WITH g AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             event_type AS next_type
      FROM events)
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM g WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
    """,
)
def event_type_transitions(sf_dir: str):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        out = pd.DataFrame({"prev_type": et[:-1], "next_type": et[1:]})
        return (
            out.groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    partial = ds.groupby("user_id").map_groups(pairs, batch_format="pandas")

    def final(t: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(t, ["prev_type", "next_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["prev_type", "next_type", "n"])
        )

    return final(combine_small(partial, lambda t: t))


# --------------------------------------------------------------------------
# Forward-window interval self-join: for every event, how many events by
# the SAME user land in the next 5 minutes — aggregated per event_type
# (the "engagement follow-up" window). The range join never materializes
# pairs: within each user partition a single sorted-timestamp array
# answers all windows via two vectorized searchsorted calls (O(n log n)
# per user vs O(n·k) pair expansion), and each group collapses straight
# to ≤ n_event_types partial rows, so the post-shuffle stream is tiny at
# any scale. Boundary semantics match the SQL exactly: strictly after ts
# (side='right' at ts), inclusive at ts + 5 min (side='right' there too).
_FOLLOW_WINDOW_US = 5 * 60 * 1_000_000

_FOLLOW_SQL = """
WITH f AS (
  SELECT e.event_id, any_value(e.event_type) AS event_type,
         count(x.event_id) AS n_follow
  FROM events e LEFT JOIN events x
    ON x.user_id = e.user_id AND x.ts > e.ts
   AND x.ts <= e.ts + INTERVAL 5 MINUTE
  GROUP BY e.event_id)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(n_follow) AS BIGINT) AS total_followups,
       ROUND(avg(n_follow), 6) AS avg_followups
FROM f GROUP BY event_type
"""


@register("event_followup_5m_by_type", sql=_FOLLOW_SQL)
def event_followup_5m_by_type(sf_dir: str, n_buckets: int = 256):
    ds = table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    # partition by user BUCKET, not user: groupby(user).map_groups pays a
    # per-group pandas call (~0.2 ms × users — measured 5.6 s at 29k
    # users); one bucket holds many users and processes them ALL in one
    # vectorized pass. The per-user windows stay correct inside a bucket
    # via an offset-shift: after lexsort (user, ts), each user's relative
    # timestamps are lifted onto a disjoint int64 range (user_rank × span,
    # span > ts_range + window), so two global searchsorted calls answer
    # every user's forward window at once with no cross-user bleed.
    # n_buckets bounds group size at events/n_buckets — tune with cluster
    # size; the key stays fixed-cardinality so the partial combine is tiny.
    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int64))
        )

    def follow_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        new_user = np.concatenate([[True], uid_s[1:] != uid_s[:-1]])
        urank = np.cumsum(new_user) - 1
        ts0 = ts_s - ts_s.min()
        span = np.int64(ts0.max()) + _FOLLOW_WINDOW_US + 1
        shifted = urank * span + ts0
        n_follow = np.searchsorted(
            shifted, shifted + _FOLLOW_WINDOW_US, side="right"
        ) - np.searchsorted(shifted, shifted, side="right")
        out = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[order], "nf": n_follow}
        )
        return out.groupby("event_type", as_index=False).agg(
            n_events=("nf", "size"), total_followups=("nf", "sum")
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(follow_bucket, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        agg = t.group_by("event_type").aggregate(
            [("n_events", "sum"), ("total_followups", "sum")]
        )
        n = agg["n_events_sum"].to_numpy(zero_copy_only=False)
        tot = agg["total_followups_sum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": agg["event_type"],
                "n_events": pa.array(n, pa.int64()),
                "total_followups": pa.array(tot, pa.int64()),
                "avg_followups": pa.array(round_half_away(tot / n, 6)),
            }
        )

    return combine_small(partials, finish)


# --------------------------------------------------------------------------
# Robust statistics per event type: median and MAD (median absolute
# deviation) of ``value``. Median is a global order statistic, so the
# exact path partitions by the (fixed, small) event_type key and sorts
# within each group; at web scale a single type's group outgrows one
# worker — swap in the histogram-quantile path (event_value_quantiles)
# there, documented trade. Matches DuckDB median()/mad() exactly: even
# counts interpolate the two middle values.


@register(
    "event_value_robust_stats",
    sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           ROUND(median(value), 6) AS med,
           ROUND(mad(value), 6) AS mad
    FROM events GROUP BY event_type
    """,
)
def event_value_robust_stats(sf_dir: str):
    ds = table(sf_dir, "events", ["event_type", "value"])

    def robust(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [len(v)],
                "med": [round_half_away(np.array([med]), 6)[0]],
                "mad": [round_half_away(np.array([mad]), 6)[0]],
            }
        )

    return ds.groupby("event_type").map_groups(robust, batch_format="pandas")
