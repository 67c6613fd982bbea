"""Dashboard-analog composite pipelines (reference §3.3: the Streamlit
dashboards that join every per-record classifier into one user table and
one time series).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count

from ..ops.common import table
from ..ops.queries import register

# labels config — parse_labels_json format (TemporalAnalysis.py:20-25):
# {label: [aliases]} where aliases here are event types
LABELS: list[tuple[str, tuple[str, ...]]] = [
    ("engagement", ("click", "view")),
    ("conversion", ("purchase", "signup")),
    ("problem", ("error",)),
]


# --------------------------------------------------------------------------
# A8 + M17 — per-minute per-label occurrence counts through an alias map
# (Visualization.py:30-37,87-91 with the labels file of siyaset_names)
_label_case = " ".join(
    f"WHEN event_type IN ({', '.join(repr(a) for a in aliases)}) THEN '{label}'"
    for label, aliases in LABELS
)


@register(
    "temporal_label_counts",
    sql=f"""
    SELECT date_trunc('minute', ts) AS minute,
           CASE {_label_case} ELSE 'other' END AS label,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def temporal_label_counts(sf_dir: str):
    ds = table(sf_dir, "events", ["ts", "event_type"])
    alias_to_label = {a: lab for lab, als in LABELS for a in als}

    def map_label(t: pa.Table) -> pa.Table:
        labels = [
            alias_to_label.get(et, "other") for et in t["event_type"].to_pylist()
        ]
        return pa.table(
            {
                "minute": pc.floor_temporal(t["ts"], unit="minute"),
                "label": pa.array(labels, pa.string()),
            }
        )

    return (
        ds.map_batches(map_label, batch_format="pyarrow")
        .groupby(["minute", "label"])
        .aggregate(Count(alias_name="n"))
    )


# --------------------------------------------------------------------------
# M9 + §3.3 — the user-stats dashboard table: one row per customer with
# every classifier applied (location normalization M14, stance stub M11,
# age stub M12/M13, region join J1) — the reference builds this table row
# by row over files (User Based Dashboard.py:42,136-153); here it is one
# broadcast-join + vectorized-classifier map over the customer table.
@register(
    "user_stats_table",
    sql="""
    SELECT c_custkey AS userid,
           c_name AS username,
           n_name AS location,
           'party' || CAST((strpos('0123456789abcdef',
                                   substr(md5(c_name), 1, 1)) - 1) % 3
                           AS VARCHAR) AS stance,
           CAST(FLOOR((12 + (strpos('0123456789abcdef', substr(md5(c_name), 1, 1)) - 1)
                           * 16 + (strpos('0123456789abcdef', substr(md5(c_name), 2, 1)) - 1)
                       ) % 73 / 10) * 10 AS BIGINT) AS age_decade,
           c_mktsegment AS segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def user_stats_table(sf_dir: str):
    import hashlib

    import ray

    nation = table(sf_dir, "nation").to_pandas()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(nmap)
    _HEX = "0123456789abcdef"

    # task pool; the broadcast dimension (ST5/J1) is a plasma-local
    # lookup per batch — no per-query actor spin-up
    def build_stats(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        nmap = ray.get(ref)
        stances, decades = [], []
        for name in df["c_name"]:
            h = hashlib.md5(name.encode()).hexdigest()
            stances.append(f"party{_HEX.index(h[0]) % 3}")
            age = (12 + _HEX.index(h[0]) * 16 + _HEX.index(h[1])) % 73
            decades.append(age // 10 * 10)
        return pd.DataFrame(
            {
                "userid": df["c_custkey"],
                "username": df["c_name"],
                "location": df["c_nationkey"].map(nmap),
                "stance": stances,
                "age_decade": pd.Series(decades, dtype="int64"),
                "segment": df["c_mktsegment"],
            }
        )

    return table(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    ).map_batches(build_stats, fn_kwargs={"ref": ref}, batch_format="pandas")


# --------------------------------------------------------------------------
# Geo map-center analog (pages/User Based Dashboard.py:356-375): the
# reference averages the lat/lon of every detected-location entry to pick
# the map's initial view center. The testdata has no geo columns, so the
# "detected location" of a customer is a deterministic coordinate derived
# from their nation key (the same dictionary-lookup shape as the location
# normalizer, Cansin_Location_Detection.py:122-193) — exact quarters, so
# float sums are order-independent and the oracle hash is stable.
@register(
    "region_map_centers",
    sql="""
    WITH pts AS (
      SELECT r_name,
             ((n_nationkey * 7) % 120) - 60 + 0.5  AS lat,
             ((n_nationkey * 13) % 360) - 180 + 0.25 AS lon
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey)
    SELECT r_name,
           ROUND(AVG(lat), 6) AS mean_lat,
           ROUND(AVG(lon), 6) AS mean_lon,
           CAST(count(*) AS BIGINT) AS n
    FROM pts
    GROUP BY r_name
    """,
)
def region_map_centers(sf_dir: str):
    """Per-region map center: mean lat/lon over every customer's detected
    location. Fixed key cardinality (5 regions) → per-batch combiner inside
    map_batches + one local final combine; the fact table never shuffles."""
    import numpy as np
    import ray

    from ..ops.common import combine_small, round_half_away

    nation = table(sf_dir, "nation").to_pandas()
    region = table(sf_dir, "region").to_pandas()
    rname = dict(zip(region["r_regionkey"], region["r_name"]))
    # nationkey → (region name, lat, lon): tiny, broadcast once
    nk_info = {
        int(nk): (rname[int(rk)],
                  float((nk * 7) % 120 - 60 + 0.5),
                  float((nk * 13) % 360 - 180 + 0.25))
        for nk, rk in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    ref = ray.put(nk_info)

    def partial(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        info = ray.get(ref)
        nk = df["c_nationkey"].to_numpy()
        pts = pd.DataFrame(
            {
                "r_name": [info[int(k)][0] for k in nk],
                "lat_sum": (nk * 7) % 120 - 60 + 0.5,
                "lon_sum": (nk * 13) % 360 - 180 + 0.25,
                "n": np.ones(len(nk), dtype=np.int64),
            }
        )
        return pts.groupby("r_name", as_index=False).sum()

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("r_name", as_index=False).sum()
        return pa.table(
            {
                "r_name": df["r_name"],
                "mean_lat": round_half_away(df["lat_sum"] / df["n"], 6),
                "mean_lon": round_half_away(df["lon_sum"] / df["n"], 6),
                "n": df["n"].astype("int64"),
            }
        )

    partials = table(sf_dir, "customer", ["c_nationkey"]).map_batches(
        partial, fn_kwargs={"ref": ref}, batch_format="pandas"
    )
    return final(combine_small(partials, lambda t: t))
