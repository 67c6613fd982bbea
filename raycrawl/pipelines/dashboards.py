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
