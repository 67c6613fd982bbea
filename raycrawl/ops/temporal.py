"""Streaming-shaped temporal operators over the ``events`` log.

Ray Data has no event-time window engine; these express the standard
stream patterns as partition-by-key + in-group ordered pandas (the
documented Ray Data idiom for stream-shaped references): as-of join
(latest prior event), gap-based sessionization, and a per-key running
aggregate. Each states its ordering assumption: events are processed per
``user_id`` ordered by ``(ts, event_id)`` — a total, deterministic order.
"""

from __future__ import annotations

import pandas as pd

from .common import table
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
