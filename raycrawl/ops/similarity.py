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

from .common import table
from .queries import register

TOP_K = 5
QUERY_IDS = (0, 1, 2)  # deterministic query vectors: the first three rows


def _load_queries(sf_dir: str) -> tuple[np.ndarray, list[int]]:
    df = (
        table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id in {list(QUERY_IDS)}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, df["vec_id"].tolist()


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

    class Score:
        def __init__(self, ref):
            self.q, self.qids = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = self.q @ m.T  # (nq, batch)
            out = []
            ids = df["vec_id"].to_numpy()
            for qi, qid in enumerate(self.qids):
                keep = ids != qid
                out.append(
                    pd.DataFrame(
                        {
                            "qid": qid,
                            "vec_id": ids[keep].astype("int64"),
                            "cosine": np.round(sims[qi][keep], 4),
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

    scored = table(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        Score, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 8)
    )

    # per-query top-k: sort within the (tiny) per-qid groups
    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return scored.groupby("qid").map_groups(topk, batch_format="pandas")


@register("ann_lsh_topk", sql=None)
def ann_lsh_topk(sf_dir: str, n_planes: int = 8):
    """LSH-bucketed ANN (scale path): random-hyperplane bucket per vector,
    search only the query's bucket. Approximate — the pytest suite checks
    recall against the brute-force baseline, the driver checks row shape."""
    rng = np.random.Generator(np.random.PCG64(13))
    q, qids = _load_queries(sf_dir)
    planes = rng.standard_normal((n_planes, q.shape[1]))
    qsig = ((q @ planes.T) > 0).astype(np.uint8)
    qsig_keys = ["".join(map(str, row)) for row in qsig]
    ref = ray.put((q, qids, planes, qsig_keys))

    class BucketScore:
        def __init__(self, ref):
            self.q, self.qids, self.planes, self.qkeys = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sig = ((m @ self.planes.T) > 0).astype(np.uint8)
            keys = np.array(["".join(map(str, r)) for r in sig])
            ids = df["vec_id"].to_numpy()
            out = []
            for qi, (qid, qk) in enumerate(zip(self.qids, self.qkeys)):
                mask = (keys == qk) & (ids != qid)
                if mask.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": qid,
                                "vec_id": ids[mask].astype("int64"),
                                "cosine": np.round(self.q[qi] @ mn[mask].T, 4),
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
        BucketScore, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 8)
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return scored.groupby("qid").map_groups(topk, batch_format="pandas")
