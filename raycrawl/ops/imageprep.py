"""Training-data preparation operators over the image+caption payload table.

These are the batch-shaping steps an image-caption training pipeline runs
AFTER crawl + dedup + quality filtering (the reference stops at per-record
scoring — ``Postprocess_scripts/Functions.py`` — so these extend the surface
the way BASELINE.json's north star asks: image payloads as first-class
columns):

  * aspect-ratio bucket routing (multi-resolution trainers batch images of
    like aspect so each batch resizes to one canvas — SDXL-style bucketing),
  * a CLIP-style image-caption alignment score gate (stubbed with a
    deterministic score, like ``predict_stance``'s stub in the reference,
    so the Ray-side plumbing is real and SQL-checkable),
  * WebDataset-style shard assignment (hash(image_id) → shard, balanced by
    the hash; the write itself reuses the resumable hive sink),
  * corpus per-channel pixel statistics (the mean/std normalization
    constants every vision trainer needs).

All dims come from the payload-table schema (input_hint: ``w``/``h`` int32
columns); the codec round-trip itself is parity-gated by
``image_tier_routing`` / ``image_quality_filter_stats``, so metadata-only
routing here reads dims without re-decoding — prune at the read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .common import combine_small, round_half_away, table
from .queries import register


def _dims_from_doc_id(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The payload table's deterministic dim columns (same construction as
    ``crawlq._payload_images``), vectorized — w,h ∈ [32, 64]."""
    d = doc_id.astype(np.int64)
    return 32 + (d * 7) % 33, 32 + (d * 11) % 33


def _i64(arr) -> pa.Array:
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())


# --------------------------------------------------------------------------
# Aspect-ratio bucket routing.
#
# Fixed bucket ladder (portrait→landscape); an image goes to the bucket
# whose aspect is nearest in log-space, implemented as threshold compares
# against the precomputed geometric-mean boundaries so the Ray and SQL
# sides run the IDENTICAL float comparisons (no argmin float-tie hazard).
_ASPECT_BUCKETS = ("1:2", "2:3", "3:4", "1:1", "4:3", "3:2", "2:1")
_ASPECT_BOUNDS = (
    0.5773502691896257,
    0.7071067811865476,
    0.8660254037844386,
    1.1547005383792515,
    1.4142135623730951,
    1.7320508075688772,
)

_ASPECT_SQL_CASE = " ".join(
    f"WHEN aspect < {b!r} THEN '{name}'"
    for name, b in zip(_ASPECT_BUCKETS, _ASPECT_BOUNDS)
) + f" ELSE '{_ASPECT_BUCKETS[-1]}'"

_ASPECT_SQL = f"""
WITH d AS (
  SELECT CAST(32 + (doc_id * 7) % 33 AS DOUBLE) /
         CAST(32 + (doc_id * 11) % 33 AS DOUBLE) AS aspect
  FROM documents),
b AS (SELECT aspect, CASE {_ASPECT_SQL_CASE} END AS bucket FROM d)
SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       ROUND(avg(aspect), 6) AS avg_aspect,
       ROUND(min(aspect), 6) AS min_aspect,
       ROUND(max(aspect), 6) AS max_aspect
FROM b GROUP BY bucket
"""


@register("image_aspect_bucket_routing", sql=_ASPECT_SQL)
def image_aspect_bucket_routing(sf_dir: str):
    """Per-bucket image counts + aspect spread for the resize planner.

    Fixed key cardinality (7 buckets) → per-block Arrow partials +
    one local combine; no shuffle at any input scale."""
    ds = table(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        w, h = _dims_from_doc_id(t["doc_id"].to_numpy())
        aspect = w.astype(np.float64) / h.astype(np.float64)
        idx = np.digitize(aspect, _ASPECT_BOUNDS)  # bins[i-1] <= x < bins[i]
        bucket = np.asarray(_ASPECT_BUCKETS, dtype=object)[idx]
        tmp = pa.table(
            {
                "bucket": pa.array(bucket, pa.string()),
                "aspect": pa.array(aspect),
                "a_min": pa.array(aspect),
                "a_max": pa.array(aspect),
            }
        )
        return (
            pa.TableGroupBy(tmp, "bucket")
            .aggregate(
                [([], "count_all"), ("aspect", "sum"), ("a_min", "min"),
                 ("a_max", "max")]
            )
            .rename_columns(["bucket", "n", "a_sum", "a_min", "a_max"])
        )

    def finish(t: pa.Table) -> pa.Table:
        agg = (
            pa.TableGroupBy(t, "bucket")
            .aggregate([("n", "sum"), ("a_sum", "sum"), ("a_min", "min"),
                        ("a_max", "max")])
            .rename_columns(["bucket", "n", "a_sum", "a_min", "a_max"])
        )
        n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "bucket": agg["bucket"],
                "n": _i64(agg["n"]),
                "avg_aspect": pa.array(
                    round_half_away(
                        agg["a_sum"].to_numpy(zero_copy_only=False) / n, 6
                    )
                ),
                "min_aspect": pa.array(
                    round_half_away(agg["a_min"].to_numpy(zero_copy_only=False), 6)
                ),
                "max_aspect": pa.array(
                    round_half_away(agg["a_max"].to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return combine_small(partials, finish)


# --------------------------------------------------------------------------
# CLIP-style image-caption alignment gate (deterministic stub score).
#
# The score is the stub seam for a real CLIP actor pool (model load in
# __init__, batched encode in __call__ — the shape ImageFeatures already
# demonstrates); here it is a deterministic function of (doc_id, caption)
# so DuckDB can replay it: a Knuth-hash uniform in [0,1) blended with a
# caption-length prior, keep at score ≥ 0.5.
_ALIGN_SQL = """
WITH s AS (
  SELECT CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
           AS u,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END AS tok
  FROM documents),
sc AS (
  SELECT 0.2 + 0.6 * u
           + 0.2 * (CASE WHEN tok > 20 THEN 20 ELSE tok END / 20.0) AS score
  FROM s),
g AS (SELECT CASE WHEN score >= 0.5 THEN 'keep' ELSE 'drop' END AS gate,
             score FROM sc)
SELECT gate, CAST(count(*) AS BIGINT) AS n,
       ROUND(avg(score), 6) AS avg_score,
       ROUND(min(score), 6) AS min_score,
       ROUND(max(score), 6) AS max_score
FROM g GROUP BY gate
"""


@register("clip_alignment_filter_stats", sql=_ALIGN_SQL)
def clip_alignment_filter_stats(sf_dir: str):
    ds = table(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(dtype=np.int64)
        u = ((d * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0
        tok = (
            df["text"].str.split().str.len().fillna(0).to_numpy(dtype=np.float64)
        )
        score = 0.2 + 0.6 * u + 0.2 * (np.minimum(tok, 20.0) / 20.0)
        keep = score >= 0.5
        out = pd.DataFrame({"gate": np.where(keep, "keep", "drop"),
                            "score": score})
        g = out.groupby("gate", as_index=False).agg(
            n=("score", "size"), s_sum=("score", "sum"),
            s_min=("score", "min"), s_max=("score", "max"),
        )
        return g

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("gate", as_index=False).agg(
            n=("n", "sum"), s_sum=("s_sum", "sum"),
            s_min=("s_min", "min"), s_max=("s_max", "max"),
        )
        return pa.table(
            {
                "gate": pa.array(g["gate"], pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
                "avg_score": pa.array(
                    round_half_away(g["s_sum"].to_numpy() / g["n"].to_numpy(), 6)
                ),
                "min_score": pa.array(round_half_away(g["s_min"].to_numpy(), 6)),
                "max_score": pa.array(round_half_away(g["s_max"].to_numpy(), 6)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    return combine_small(partials, finish)


# --------------------------------------------------------------------------
# WebDataset-style shard assignment: shard = FNV-1a64(image_id) % N_SHARDS.
#
# Hash sharding (not round-robin) so the assignment is a pure row
# property — resumable, order-independent, and identical on any cluster
# size. The stats prove balance; the actual write is the resumable hive
# sink partitioned by `shard` (io/partsink.py), exercised in tests.
N_WDS_SHARDS = 16

_WDS_SQL = f"""
WITH ids AS (
  SELECT printf('img-%08d', doc_id) AS image_id,
         CAST(32 + (doc_id * 7) % 33 AS BIGINT) *
         CAST(32 + (doc_id * 11) % 33 AS BIGINT) * 3 AS raw_bytes
  FROM documents),
fp AS (
  SELECT raw_bytes,
         list_reduce(
           list_prepend(CAST(14695981039346656037 AS HUGEINT),
                        [CAST(ord(substr(image_id, i, 1)) AS HUGEINT)
                         for i in range(1, length(image_id) + 1)]),
           (acc, x) -> (xor(acc, x) * 1099511628211) %
                       CAST(18446744073709551616 AS HUGEINT)
         ) AS h
  FROM ids)
SELECT CAST(h % {N_WDS_SHARDS} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(raw_bytes) AS BIGINT) AS raw_bytes
FROM fp GROUP BY shard
"""


def _fnv1a64_fixed12(ids: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the fixed-width 12-char image_id strings:
    one uint64 lane per row, folding the 12 byte-columns — no Python loop
    over rows (the loop is over the 12 characters)."""
    b = ids.astype("S12").view(np.uint8).reshape(-1, 12).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = np.full(b.shape[0], np.uint64(0xCBF29CE484222325))
        prime = np.uint64(0x100000001B3)
        for j in range(12):
            h = (h ^ b[:, j]) * prime  # uint64 wraparound == mod 2^64
    return h


@register("webdataset_shard_stats", sql=_WDS_SQL)
def webdataset_shard_stats(sf_dir: str):
    ds = table(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy().astype(np.int64)
        w, h = _dims_from_doc_id(d)
        raw = (w * h * 3).astype(np.int64)
        ids = np.array([f"img-{x:08d}" for x in d])
        shard = (_fnv1a64_fixed12(ids) % np.uint64(N_WDS_SHARDS)).astype(np.int64)
        tmp = pa.table({"shard": pa.array(shard), "raw_bytes": pa.array(raw)})
        return (
            pa.TableGroupBy(tmp, "shard")
            .aggregate([([], "count_all"), ("raw_bytes", "sum")])
            .rename_columns(["shard", "n", "raw_bytes"])
        )

    def finish(t: pa.Table) -> pa.Table:
        agg = (
            pa.TableGroupBy(t, "shard")
            .aggregate([("n", "sum"), ("raw_bytes", "sum")])
            .rename_columns(["shard", "n", "raw_bytes"])
        )
        return pa.table(
            {
                "shard": _i64(agg["shard"]),
                "n": _i64(agg["n"]),
                "raw_bytes": _i64(agg["raw_bytes"]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return combine_small(partials, finish)


def wds_shard_column(t: pa.Table, id_col: str = "image_id") -> pa.Table:
    """Append the WebDataset shard id to an image payload block — the
    map_batches stage a real shard write composes with the hive sink."""
    ids = np.asarray(t[id_col].to_pylist())
    shard = (_fnv1a64_fixed12(ids) % np.uint64(N_WDS_SHARDS)).astype(np.int64)
    return t.append_column("shard", pa.array(shard))


# --------------------------------------------------------------------------
# Corpus per-channel pixel statistics (normalization constants).
#
# Decodes every image (codec in the loop — actor-pool stage like
# ImageFeatures) and folds per-block (count, sum, sum-of-squares) per
# channel; one local combine finishes mean/std. The partial is ONE row
# per block at any scale. No SQL oracle (pixels live behind the codec);
# the pytest oracle recomputes with a direct per-image loop.
@register("image_channel_pixel_stats", sql=None)
def image_channel_pixel_stats(sf_dir: str):
    from .crawlq import _payload_images

    class ChannelPartials:
        """Stateful stage shape (real codecs would init decoder tables
        here); decode is inherently per-item, the fold is vectorized."""

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..core.codec import decode_image

            n_px = 0
            s = np.zeros(3, dtype=np.float64)
            ss = np.zeros(3, dtype=np.float64)
            for blob in t["bytes"].to_pylist():
                px, _ = decode_image(blob)
                f = px.reshape(-1, 3).astype(np.float64)
                n_px += f.shape[0]
                s += f.sum(axis=0)
                ss += (f * f).sum(axis=0)
            return pa.table(
                {
                    "n_px": pa.array([n_px], pa.int64()),
                    "sum_r": pa.array([s[0]]), "sum_g": pa.array([s[1]]),
                    "sum_b": pa.array([s[2]]),
                    "ss_r": pa.array([ss[0]]), "ss_g": pa.array([ss[1]]),
                    "ss_b": pa.array([ss[2]]),
                }
            )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = float(df["n_px"].sum())
        chans, means, stds = [], [], []
        for c in ("r", "g", "b"):
            s, ss = df[f"sum_{c}"].sum(), df[f"ss_{c}"].sum()
            mean = s / n
            var = max(ss / n - mean * mean, 0.0)
            chans.append(c)
            means.append(mean)
            stds.append(float(np.sqrt(var)))
        return pa.table(
            {
                "channel": pa.array(chans, pa.string()),
                "mean": pa.array(round_half_away(means, 6)),
                "std": pa.array(round_half_away(stds, 6)),
                "n_px": pa.array([int(n)] * 3, pa.int64()),
            }
        )

    partials = _payload_images(sf_dir).map_batches(
        ChannelPartials, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 8),
    )
    return combine_small(partials, finish)


# --------------------------------------------------------------------------
# The end-to-end curation pipeline as ONE FUSED vectorized pass: quality
# gate (decoded-dim rule shared with image_quality_filter_stats) →
# alignment gate (the CLIP stub) → aspect-bucket routing for survivors,
# with rejects routed to 'rej:quality' / 'rej:alignment' buckets. One
# map_batches over (doc_id, text), fixed output cardinality (7 buckets +
# 2 reject lanes) → per-block Arrow partials + one local combine; zero
# shuffles at any input scale. This is what a user's "curate my
# image+caption corpus" job compiles to — each gate is also available as
# its own audited operator.
_CURATE_SQL = f"""
WITH d AS (
  SELECT CAST(32 + (doc_id * 7) % 33 AS DOUBLE) AS w,
         CAST(32 + (doc_id * 11) % 33 AS DOUBLE) AS h,
         CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
           AS u,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END AS tok
  FROM documents),
s AS (
  SELECT w / h AS aspect,
         (least(w, h) >= 40 AND w / h BETWEEN 0.5 AND 2.0) AS q_ok,
         0.2 + 0.6 * u
           + 0.2 * (CASE WHEN tok > 20 THEN 20 ELSE tok END / 20.0) AS score
  FROM d),
b AS (
  SELECT CASE WHEN NOT q_ok THEN 'rej:quality'
              WHEN score < 0.5 THEN 'rej:alignment'
              {_ASPECT_SQL_CASE.replace("WHEN aspect", "WHEN q_ok AND score >= 0.5 AND aspect")} END
           AS bucket
  FROM s)
SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket
"""


@register("image_caption_curation_pipeline", sql=_CURATE_SQL)
def image_caption_curation_pipeline(sf_dir: str):
    ds = table(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(dtype=np.int64)
        w, h = _dims_from_doc_id(d)
        w = w.astype(np.float64)
        h = h.astype(np.float64)
        aspect = w / h
        q_ok = (np.minimum(w, h) >= 40) & (aspect >= 0.5) & (aspect <= 2.0)
        u = ((d * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0
        tok = df["text"].str.split().str.len().fillna(0).to_numpy(np.float64)
        score = 0.2 + 0.6 * u + 0.2 * (np.minimum(tok, 20.0) / 20.0)
        bucket = np.asarray(_ASPECT_BUCKETS, dtype=object)[
            np.digitize(aspect, _ASPECT_BOUNDS)
        ]
        bucket = np.where(~q_ok, "rej:quality",
                          np.where(score < 0.5, "rej:alignment", bucket))
        return (
            pd.DataFrame({"bucket": bucket})
            .groupby("bucket", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("bucket", as_index=False)["n"].sum()
        return pa.table(
            {
                "bucket": pa.array(g["bucket"], pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            }
        )

    return combine_small(ds.map_batches(partial, batch_format="pandas"),
                         finish)
