"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline: the (small) query matrix is
broadcast once via ``ray.put`` and every batch does one numpy matmul
against it — the canonical "broadcast small side, stream big side" shape.
The LSH-bucketed variant is the scale path: random-hyperplane signs bucket
the vectors, candidate search touches only matching buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .common import round_half_away, table
from .queries import register

TOP_K = 5
QUERY_IDS = (0, 1, 2)  # deterministic query vectors: the first three rows


def _load_queries(sf_dir: str) -> tuple[np.ndarray, list[int]]:
    """The 3 query vectors — a driver-side pyarrow filtered read (row-group
    pruned): launching a Ray pipeline to fetch 3 rows costs more than the
    read itself. The corpus scan stays a streamed Dataset."""
    import os

    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(list(QUERY_IDS)),
    )
    df = t.to_pandas().sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, df["vec_id"].tolist()



def _local_topk(df: pd.DataFrame) -> pd.DataFrame:
    """Per-block top-K per query — the survivors (≤ K × blocks rows) merge
    on the driver; no groupby shuffle for a LIMIT-K."""
    if not len(df):
        return df
    return (
        df.sort_values(["qid", "cosine", "vec_id"], ascending=[True, False, True])
        .groupby("qid", sort=False)
        .head(TOP_K)
    )


def _finish_topk(scored) -> pd.DataFrame:
    pdf = scored.map_batches(_local_topk, batch_format="pandas").to_pandas()
    out = []
    for qid, g in pdf.groupby("qid"):
        g = (
            g.sort_values(["cosine", "vec_id"], ascending=[False, True])
            .head(TOP_K)
            .reset_index(drop=True)
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        out.append(g)
    if not out:
        return pd.DataFrame(
            {"qid": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64"),
             "rank": pd.Series([], dtype="int64")}
        )
    return pd.concat(out, ignore_index=True)


@register(
    "ann_bruteforce_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id IN {tuple(QUERY_IDS)}),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])), 4) AS cosine
      FROM q JOIN embeddings e ON e.vec_id != q.qid),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_bruteforce_topk(sf_dir: str):
    """Exact top-k by cosine for each query vector (rank ties broken by
    vec_id; scores rounded to 4 decimals BEFORE ranking on both sides so
    float-order jitter cannot flip ranks)."""
    q, qids = _load_queries(sf_dir)
    ref = ray.put((q, qids))

    # task pool, not an actor pool: the broadcast query matrix is fetched
    # per batch via ray.get (a local plasma lookup after the first fetch on
    # each worker) — per-query actor spin-up costs more than it saves here
    def score(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        qm, qids_ = ray.get(ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = qm @ m.T  # (nq, batch)
        out = []
        ids = df["vec_id"].to_numpy()
        for qi, qid in enumerate(qids_):
            keep = ids != qid
            out.append(
                pd.DataFrame(
                    {
                        "qid": qid,
                        "vec_id": ids[keep].astype("int64"),
                        "cosine": round_half_away(sims[qi][keep], 4),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    scored = table(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        score, fn_kwargs={"ref": ref}, batch_format="pandas"
    )
    return _finish_topk(scored)


N_PLANES = 8
_EMB_DIM = 64


def _lsh_planes(n_planes: int = N_PLANES, dim: int = _EMB_DIM) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(13))
    return rng.standard_normal((n_planes, dim))


def _planes_sql_values() -> str:
    rows = [
        f"({k}, CAST([{', '.join(repr(float(x)) for x in row)}] AS DOUBLE[]))"
        for k, row in enumerate(_lsh_planes())
    ]
    return ", ".join(rows)


@register(
    "ann_lsh_topk",
    # the SQL oracle replays the hyperplane signatures exactly: the fixed
    # seeded plane matrix is embedded as literals, the bucket key is the
    # concatenated sign string, search touches only the query's bucket
    sql=f"""
    WITH p(k, plane) AS (VALUES {_planes_sql_values()}),
    sigs AS (
      SELECT e.vec_id, e.embedding,
             string_agg(CASE WHEN list_inner_product(
                               CAST(e.embedding AS DOUBLE[]), p.plane) > 0
                        THEN '1' ELSE '0' END, '' ORDER BY p.k) AS sig
      FROM embeddings e CROSS JOIN p GROUP BY e.vec_id, e.embedding
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe, sig AS qsig FROM sigs
          WHERE vec_id IN {tuple(QUERY_IDS)}),
    scored AS (
      SELECT q.qid, s.vec_id,
             ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                          CAST(s.embedding AS DOUBLE[])), 4)
               AS cosine
      FROM q JOIN sigs s ON s.sig = q.qsig AND s.vec_id != q.qid),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_lsh_topk(sf_dir: str, n_planes: int = N_PLANES):
    """LSH-bucketed ANN (scale path): random-hyperplane bucket per vector,
    search only the query's bucket. The pytest suite checks recall against
    the brute-force baseline; the SQL oracle replays the buckets exactly."""
    q, qids = _load_queries(sf_dir)
    planes = _lsh_planes(n_planes, q.shape[1])
    qsig = ((q @ planes.T) > 0).astype(np.uint8)
    qsig_keys = ["".join(map(str, row)) for row in qsig]
    ref = ray.put((q, qids, planes, qsig_keys))

    def bucket_score(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        qm, qids_, planes_, qkeys = ray.get(ref)  # local plasma lookup
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sig = ((m @ planes_.T) > 0).astype(np.uint8)
        keys = np.array(["".join(map(str, r)) for r in sig])
        ids = df["vec_id"].to_numpy()
        out = []
        for qi, (qid, qk) in enumerate(zip(qids_, qkeys)):
            mask = (keys == qk) & (ids != qid)
            if mask.any():
                out.append(
                    pd.DataFrame(
                        {
                            "qid": qid,
                            "vec_id": ids[mask].astype("int64"),
                            "cosine": round_half_away(qm[qi] @ mn[mask].T, 4),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    scored = table(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        bucket_score, fn_kwargs={"ref": ref}, batch_format="pandas"
    )
    return _finish_topk(scored)


N_PROBE = 2


@register(
    "ann_ivf_topk",
    # SQL oracle recomputes the coarse quantizer (per-label centroid =
    # position-wise mean, rounded to 6 decimals on both sides so
    # summation-order jitter cannot shift an assignment), assigns every
    # vector to its argmax-cosine centroid, probes the query's top-2
    # centroid buckets and ranks candidates by rounded cosine
    sql=f"""
    WITH dims AS (SELECT unnest(range(1, {_EMB_DIM} + 1)) AS i),
    cent AS (
      SELECT label, i,
             ROUND(AVG(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) AS c
      FROM embeddings, dims GROUP BY label, i
    ),
    cents AS (SELECT label, list(c ORDER BY i) AS cvec FROM cent GROUP BY label),
    asn AS (
      SELECT vec_id, label FROM (
        SELECT e.vec_id, c.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec) DESC, c.label
               ) AS r
        FROM embeddings e CROSS JOIN cents c) WHERE r = 1
    ),
    probe AS (
      SELECT qid, label FROM (
        SELECT e.vec_id AS qid, c.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec) DESC, c.label
               ) AS r
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id IN {tuple(QUERY_IDS)}) WHERE r <= {N_PROBE}
    ),
    scored AS (
      SELECT p.qid, a.vec_id,
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])), 4)
               AS cosine
      FROM probe p
      JOIN asn a ON a.label = p.label AND a.vec_id != p.qid
      JOIN embeddings q ON q.vec_id = p.qid
      JOIN embeddings e ON e.vec_id = a.vec_id),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_ivf_topk(sf_dir: str, nprobe: int = N_PROBE):
    """IVF ANN (the 100-TB scale path): a coarse quantizer (per-label
    centroid — one training pass over the corpus) buckets every vector
    into an inverted file; a query probes only its ``nprobe``
    nearest-centroid buckets. Centroids are trained DISTRIBUTED — per-batch
    partial sums, then a tiny driver-side reduce — and broadcast once; the
    candidate scan is a streamed vectorized filter per batch. At web scale
    the bucket assignment becomes the partitioning key so each probe reads
    only its buckets' partitions."""
    ds = table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    # 1. train: distributed per-label partial sums → tiny driver reduce
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"label": [], "s": [], "n": []}
        if not len(df):
            return pd.DataFrame(rows)
        for lab, g in df.groupby("label"):
            s = np.stack(g["embedding"].to_numpy()).astype(np.float64).sum(axis=0)
            rows["label"].append(lab)
            rows["s"].append(s.tolist())
            rows["n"].append(len(g))
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    labels_sorted = sorted(parts["label"].unique())
    cent = np.stack(
        [
            round_half_away(
                np.sum(np.stack(parts[parts["label"] == lab]["s"].to_numpy()),
                       axis=0)
                / parts[parts["label"] == lab]["n"].sum(),
                6,
            )
            for lab in labels_sorted
        ]
    )
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    # 2. probe lists for the query vectors (queries are normalized)
    q, qids = _load_queries(sf_dir)
    qsims = q @ cent_n.T
    probes = {
        qid: {labels_sorted[j]
              for j in np.argsort(-qsims[qi], kind="stable")[:nprobe]}
        for qi, qid in enumerate(qids)
    }
    ref = ray.put((q, qids, cent_n, np.array(labels_sorted), probes))

    # 3. streamed candidate scan: assign each batch vector to its centroid,
    #    keep only vectors landing in a probed bucket (task pool; broadcast
    #    state fetched per batch — a local plasma lookup)
    def ivf_score(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        qm, qids_, cent_n_, labels_, probes_ = ray.get(ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = labels_[np.argmax(mn @ cent_n_.T, axis=1)]
        ids = df["vec_id"].to_numpy()
        out = []
        for qi, qid in enumerate(qids_):
            mask = np.isin(assign, list(probes_[qid])) & (ids != qid)
            if mask.any():
                out.append(
                    pd.DataFrame(
                        {
                            "qid": qid,
                            "vec_id": ids[mask].astype("int64"),
                            "cosine": round_half_away(qm[qi] @ mn[mask].T, 4),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    scored = ds.map_batches(ivf_score, fn_kwargs={"ref": ref},
                            batch_format="pandas")
    return _finish_topk(scored)


# --------------------------------------------------------------------------
# Embedding-column statistics: per-label L2-norm count/avg/min/max. The
# partial is computed per block with one segment-reduced numpy pass over
# the flattened list<float> values (no per-row Python), collapses to
# ≤ n_labels rows per block, and the fixed label cardinality makes the
# local combine exact at any scale (no shuffle at all).

_NORM_STATS_SQL = """
WITH x AS (SELECT vec_id, label, unnest(embedding) AS v FROM embeddings),
n AS (SELECT vec_id, any_value(label) AS label,
             sqrt(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
      FROM x GROUP BY vec_id)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       ROUND(avg(nrm), 6) AS avg_norm,
       ROUND(min(nrm), 6) AS min_norm,
       ROUND(max(nrm), 6) AS max_norm
FROM n GROUP BY label
"""


def _list_f64_matrix(col) -> np.ndarray:
    """(rows, dim) float64 view of a list<float> column via offsets — no
    per-row Python, tolerant of ragged lists (segment-summed)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = col.offsets.to_numpy().astype(np.int64)
    widths = np.diff(offsets)
    if len(widths) == 0:  # empty batch: 0-row matrix, width unknown
        return vals.reshape(0, 0)
    if (widths == widths[0]).all():
        return vals.reshape(len(widths), widths[0])
    raise ValueError("ragged embedding column")


@register("embedding_norm_stats", sql=_NORM_STATS_SQL)
def embedding_norm_stats(sf_dir: str):
    import pyarrow as pa

    from .common import combine_small

    ds = table(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        mat = _list_f64_matrix(t["embedding"])
        nrm = np.sqrt((mat * mat).sum(axis=1))
        tmp = pa.table(
            {"label": t["label"], "nrm": pa.array(nrm, pa.float64())}
        )
        return tmp.group_by("label").aggregate(
            [("nrm", "count"), ("nrm", "sum"), ("nrm", "min"), ("nrm", "max")]
        )

    def finish(t: pa.Table) -> pa.Table:
        agg = t.group_by("label").aggregate(
            [
                ("nrm_count", "sum"),
                ("nrm_sum", "sum"),
                ("nrm_min", "min"),
                ("nrm_max", "max"),
            ]
        )
        n = agg["nrm_count_sum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": agg["label"],
                "n": pa.array(n.astype(np.int64)),
                "avg_norm": pa.array(
                    round_half_away(
                        agg["nrm_sum_sum"].to_numpy(zero_copy_only=False) / n, 6
                    )
                ),
                "min_norm": pa.array(
                    round_half_away(
                        agg["nrm_min_min"].to_numpy(zero_copy_only=False), 6
                    )
                ),
                "max_norm": pa.array(
                    round_half_away(
                        agg["nrm_max_max"].to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return combine_small(partials, finish)


# --------------------------------------------------------------------------
# Pairwise label-centroid cosine similarity: the "how separable are my
# clusters" diagnostic. The distributed part is a per-block partial
# VECTOR sum per label (one pandas groupby-sum over the (rows, dim)
# matrix — the mergeable-sketch shape applied to dense vectors); the
# driver reduce is n_labels × dim doubles, and the pairwise cosine over
# n_labels centroids is a single tiny matmul.

_CENTROID_COS_SQL = """
WITH x AS (SELECT label, unnest(embedding) AS v,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
c AS (SELECT label, i, avg(CAST(v AS DOUBLE)) AS m FROM x GROUP BY label, i),
nrm AS (SELECT label, sqrt(sum(m * m)) AS nn FROM c GROUP BY label),
d AS (SELECT a.label AS label_a, b.label AS label_b, sum(a.m * b.m) AS dot
      FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
      GROUP BY a.label, b.label)
SELECT d.label_a, d.label_b,
       ROUND(d.dot / (na.nn * nb.nn), 6) AS cosine
FROM d
JOIN nrm na ON na.label = d.label_a
JOIN nrm nb ON nb.label = d.label_b
"""


@register("label_centroid_cosine", sql=_CENTROID_COS_SQL)
def label_centroid_cosine(sf_dir: str):
    import pyarrow as pa

    from .common import combine_small

    ds = table(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        mat = _list_f64_matrix(t["embedding"])
        labels = t["label"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(mat)
        df["label"] = labels
        sums = df.groupby("label").sum()
        counts = df.groupby("label").size()
        return pa.table(
            {
                "label": pa.array(sums.index.to_numpy()),
                "n": pa.array(counts.to_numpy(np.int64)),
                "vsum": pa.array(list(sums.to_numpy()), pa.list_(pa.float64())),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        vs = _list_f64_matrix(t["vsum"])
        order = np.argsort(labels, kind="stable")
        uniq, starts = np.unique(labels[order], return_index=True)
        cents = np.add.reduceat(vs[order], starts, axis=0)
        cents /= np.add.reduceat(n[order], starts)[:, None]
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        cos = cents @ cents.T
        ia, ib = np.triu_indices(len(uniq), k=1)
        return pa.table(
            {
                "label_a": pa.array(uniq[ia]),
                "label_b": pa.array(uniq[ib]),
                "cosine": pa.array(round_half_away(cos[ia, ib], 6)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return combine_small(partials, finish)


# --------------------------------------------------------------------------
# Hard-negative mining (contrastive-training staple): for each query
# vector, the top-k most-similar vectors with a DIFFERENT label — the
# "close but wrong" examples a contrastive loss needs. Same broadcast
# query matrix + streamed matmul shape as ann_bruteforce_topk with one
# extra vectorized label mask; scores rounded to 4 decimals BEFORE
# ranking on both sides so float-order jitter cannot flip ranks.

HARD_NEG_K = 5


def _query_labels(sf_dir: str) -> dict[int, int]:
    import os

    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        columns=["vec_id", "label"],
        filter=pads.field("vec_id").isin(list(QUERY_IDS)),
    )
    df = t.to_pandas()
    return dict(zip(df["vec_id"].astype(int), df["label"].astype(int)))


@register(
    "ann_hard_negatives",
    sql=f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
               FROM embeddings WHERE vec_id IN {tuple((0, 1, 2))}),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])), 4)
               AS cosine
      FROM q JOIN embeddings e ON e.label != q.qlabel),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {HARD_NEG_K}
    """,
)
def ann_hard_negatives(sf_dir: str):
    q, qids = _load_queries(sf_dir)
    qlabels = _query_labels(sf_dir)
    qlab = np.asarray([qlabels[i] for i in qids], dtype=np.int64)
    ref = ray.put((q, qids, qlab))

    ds = table(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def score(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        qm, qid_list, qlab_arr = ray.get(ref)
        if not len(df):
            return pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        cos = mat @ qm.T  # (rows, n_queries)
        labels = df["label"].to_numpy().astype(np.int64)
        out = []
        for j, (qid, ql) in enumerate(zip(qid_list, qlab_arr)):
            keep = labels != ql  # hard negatives: different label only
            sub = pd.DataFrame(
                {
                    "qid": qid,
                    "vec_id": df["vec_id"].to_numpy()[keep],
                    "cosine": round_half_away(cos[keep, j], 4),
                }
            )
            # per-block top-k partial (rounded-then-ranked, ties by vec_id)
            sub = sub.sort_values(
                ["cosine", "vec_id"], ascending=[False, True]
            ).head(HARD_NEG_K)
            out.append(sub)
        return pd.concat(out, ignore_index=True)

    pdf = ds.map_batches(
        score, fn_kwargs={"ref": ref}, batch_format="pandas"
    ).to_pandas()
    out = []
    for qid, g in pdf.groupby("qid"):
        g = (
            g.sort_values(["cosine", "vec_id"], ascending=[False, True])
            .head(HARD_NEG_K)
            .reset_index(drop=True)
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        out.append(g)
    return pd.concat(out, ignore_index=True)


# --------------------------------------------------------------------------
# kNN label-consistency retrieval eval (recall@1 / recall@5 per label) —
# the standard embedding-quality probe a training pipeline runs after
# every encoder update: does nearest-neighbor retrieval return items of
# the same class?  Every vector queries the full eval set; the index
# matrix (vec_id-sorted, L2-normalized float64) is ``ray.put`` once and
# each batch does ONE matmul against it — same broadcast-index shape as
# ann_bruteforce_topk, and like it this is an EVAL-SET operator: the
# broadcast is bounded by the eval sample (thousands of rows), never the
# corpus.  Cosines round to 4 decimals before ranking with a vec_id
# ascending tie-break (the repo-wide float-determinism idiom) so the
# DuckDB window replay ranks identically.  Recall numerators stay integer
# counts until one final division — no float summation-order hazard.

_KNN_RECALL_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
s AS (
  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid,
         b.label AS nlabel,
         ROUND(list_cosine_similarity(a.v, b.v), 4) AS c
  FROM e a JOIN e b ON a.vec_id != b.vec_id),
r AS (
  SELECT qid, qlabel, nlabel,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rnk
  FROM s),
t AS (
  SELECT qid, qlabel,
         MAX(CASE WHEN rnk = 1 AND nlabel = qlabel THEN 1 ELSE 0 END)
           AS hit1,
         SUM(CASE WHEN rnk <= 5 AND nlabel = qlabel THEN 1 ELSE 0 END)
           AS hit5
  FROM r GROUP BY qid, qlabel)
SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(hit1) AS DOUBLE) / count(*), 6) AS recall_at_1,
       ROUND(CAST(SUM(hit5) AS DOUBLE) / (5 * count(*)), 6) AS recall_at_5
FROM t GROUP BY qlabel
"""


@register("knn_label_recall", sql=_KNN_RECALL_SQL)
def knn_label_recall(sf_dir: str):
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads

    from .common import combine_small

    # eval-set index: one bounded driver read, broadcast once
    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        columns=["vec_id", "embedding", "label"]
    )
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    idx_ids = df["vec_id"].to_numpy().astype(np.int64)
    idx_labels = df["label"].to_numpy().astype(np.int64)
    ref = ray.put((mat, idx_ids, idx_labels))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m, ids, labels = ray.get(ref)
        q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        cos = round_half_away(q @ m.T, 4)
        qids = batch["vec_id"].to_numpy().astype(np.int64)
        qlabels = batch["label"].to_numpy().astype(np.int64)
        # exclude self; index is vec_id-sorted so stable argsort on -cos
        # tie-breaks by ascending vec_id exactly like the SQL window
        cos[qids[:, None] == ids[None, :]] = -np.inf
        order = np.argsort(-cos, axis=1, kind="stable")[:, :TOP_K]
        top_labels = labels[order]
        hit1 = (top_labels[:, 0] == qlabels).astype(np.int64)
        hit5 = (top_labels == qlabels[:, None]).sum(axis=1).astype(np.int64)
        return (
            pd.DataFrame({"label": qlabels, "n": 1, "hit1": hit1,
                          "hit5": hit5})
            .groupby("label", as_index=False)
            .sum()
        )

    def finish(tt: pa.Table) -> pa.Table:
        g = tt.to_pandas().groupby("label", as_index=False).sum()
        n = g["n"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "label": pa.array(g["label"].to_numpy(dtype=np.int64),
                                  pa.int32()),
                "n": pa.array(n),
                "recall_at_1": pa.array(
                    round_half_away(g["hit1"].to_numpy(np.float64) / n, 6)
                ),
                "recall_at_5": pa.array(
                    round_half_away(
                        g["hit5"].to_numpy(np.float64) / (TOP_K * n), 6
                    )
                ),
            }
        )

    ds = table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return combine_small(ds.map_batches(score, batch_format="pandas"),
                         finish)
