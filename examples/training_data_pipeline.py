"""Training-data curation walkthrough: the dedup → quality → featurize →
similarity chain a 100 TB corpus pipeline runs, on the documents table.

    python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from raycrawl.ops.dedup import (
        exact_dedup_by_hash,
        minhash_lsh_candidates,
        simhash_dedup_groups,
    )
    from raycrawl.ops.textops import doc_fingerprints, doc_quality_scores, langid_confusion
    from raycrawl.ops.scoring import pickled_estimator_scores, tfidf_top_terms
    from raycrawl.ops.similarity import ann_bruteforce_topk, ann_ivf_topk
    from raycrawl.ops.crawlq import image_phash_neardup_groups

    def as_df(r):
        import pandas as pd

        return r if isinstance(r, pd.DataFrame) else r.to_pandas()

    exact = as_df(exact_dedup_by_hash(sf_dir))
    print(f"[dedup/exact] {len(exact)} distinct docs "
          f"(max group {exact['group_size'].max()})")

    near = as_df(minhash_lsh_candidates(sf_dir))
    print(f"[dedup/minhash-lsh] {len(near)} verified near-dup pairs "
          f"(Jaccard ≥ 0.5)")

    sim = as_df(simhash_dedup_groups(sf_dir))
    print(f"[dedup/simhash] {len(sim)} simhash groups")

    fp = as_df(doc_fingerprints(sf_dir))
    print(f"[dedup/fingerprint] {fp['fingerprint'].nunique()} distinct "
          f"FNV-1a fingerprints")

    imgdup = as_df(image_phash_neardup_groups(sf_dir))
    print(f"[dedup/image-phash] {len(imgdup)} image groups "
          f"(largest {imgdup['group_size'].max()})")

    q = as_df(doc_quality_scores(sf_dir))
    keep = q[(q["n_tokens"] >= 10) & (q["stopword_ratio"] < 0.5)]
    print(f"[quality] {len(keep)}/{len(q)} docs pass the length/stopword gate")

    lid = as_df(langid_confusion(sf_dir))
    agree = lid[lid["lang"] == lid["predicted"]]["n"].sum() / lid["n"].sum()
    print(f"[lang-id] heuristic agrees with the lang column on "
          f"{agree:.0%} of docs")

    tf = as_df(tfidf_top_terms(sf_dir))
    print(f"[tf-idf] top terms computed for {len(tf)} docs; "
          f"most common top term: {tf['top_term'].mode().iloc[0]!r}")

    scores = as_df(pickled_estimator_scores(sf_dir))
    print(f"[model] pickled-estimator scored {len(scores)} embeddings "
          f"({int(scores['label'].sum())} positive)")

    ann = as_df(ann_bruteforce_topk(sf_dir))
    print(f"[similarity/exact] top-{ann['rank'].max()} neighbours for "
          f"{ann['qid'].nunique()} query vectors")

    ivf = as_df(ann_ivf_topk(sf_dir))
    print(f"[similarity/ivf] {len(ivf)} probe results from nprobe=2 "
          f"coarse-quantizer buckets")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
