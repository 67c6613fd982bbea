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

    from raycrawl.ops.similarity import ann_hard_negatives
    from raycrawl.ops.textops import bm25_top_docs
    from raycrawl.ops.dedup import duplicate_ngram_fraction
    from raycrawl.ops.mlprep import (
        temperature_mix_targets,
        weighted_sample_docs,
    )

    hn = as_df(ann_hard_negatives(sf_dir))
    print(f"[similarity/hard-neg] {len(hn)} cross-label hard negatives "
          f"mined for contrastive training")

    bm = as_df(bm25_top_docs(sf_dir))
    print(f"[rank/bm25] top doc {int(bm['doc_id'].iloc[0])} at "
          f"bm25={bm['bm25'].iloc[0]:.3f}")

    dupfrac = as_df(duplicate_ngram_fraction(sf_dir))
    boiler = (dupfrac["dup_frac"] > 0.5).sum()
    print(f"[dedup/ngram-frac] {boiler}/{len(dupfrac)} docs are >50% "
          f"shared 5-gram boilerplate")

    mix = as_df(temperature_mix_targets(sf_dir))
    print(f"[mix/temperature] flattened sampling targets over "
          f"{len(mix)} languages (budget {int(mix['target_n'].sum())})")

    ws = as_df(weighted_sample_docs(sf_dir))
    print(f"[sample/a-es] {len(ws)} docs drawn length-weighted "
          f"(mean n_chars {ws['n_chars'].mean():.0f})")

    # final curation — a genuinely CHAINED stream: drop the eval split AND
    # every contaminated train doc, mask sensitive terms in the survivors'
    # text, pack the FILTERED corpus into token-budget chunks, and write
    # partitioned parquet (one directory per chunk block — the
    # resumable-output shape). Each stage feeds the next; nothing from a
    # dropped doc reaches the output.
    import shutil

    import pyarrow as pa

    from raycrawl.ops.curation import (
        _MASK_PATTERN,
        MASK_TAG,
        benchmark_contamination,
        pack_by_running_total,
        tokens_with_bucket,
        EVAL_MOD,
    )

    contam = as_df(benchmark_contamination(sf_dir))
    import numpy as np
    bad = ray.put(np.sort(contam["doc_id"].to_numpy("int64")))
    print(f"[curate/contamination] {len(contam)} train docs share a "
          f"3-shingle with the eval split — dropped (plus the eval split "
          f"itself, doc_id % {EVAL_MOD} == 0)")

    def clean_and_mask(t: "pa.Table", *, bad) -> "pa.Table":
        import numpy as np
        import pyarrow.compute as pc  # noqa: F401

        drop = ray.get(bad)  # zero-copy sorted int64 array from plasma
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        not_contaminated = ~np.isin(ids, drop, assume_unique=True)
        t = t.filter(pa.array((ids % EVAL_MOD != 0) & not_contaminated))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pc.replace_substring_regex(
                    t["text"], _MASK_PATTERN, MASK_TAG
                ),
            }
        )

    import ray.data as rd

    curated = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(clean_and_mask, fn_kwargs={"bad": bad},
                  batch_format="pyarrow")
    packed = pack_by_running_total(
        curated.map_batches(tokens_with_bucket, batch_format="pyarrow")
    )

    def add_block(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        block = pc.cast(pc.floor(pc.divide(pc.cast(t["chunk_id"],
                                                   pa.float64()), 64.0)),
                        pa.int64())
        return t.append_column("chunk_block", block)

    from raycrawl.io.partsink import (
        read_partitioned,
        write_partitioned_resumable,
    )

    out = "/tmp/raycrawl_curated"
    shutil.rmtree(out, ignore_errors=True)
    blocks = packed.map_batches(add_block, batch_format="pyarrow")
    r1 = write_partitioned_resumable(blocks, out, "chunk_block")
    # a resumed run over the same input skips every committed partition
    r2 = write_partitioned_resumable(
        packed.map_batches(add_block, batch_format="pyarrow"), out,
        "chunk_block",
    )
    assert r2["written"] == [] and sorted(r2["skipped"]) == sorted(
        r1["written"]
    ), "resume must skip all committed partitions"
    print(f"[curate/sink] {len(r1['written'])} partitions committed; "
          f"resume skipped all {len(r2['skipped'])}")
    written = read_partitioned(out, "chunk_block").to_pandas()
    assert not set(int(d) for d in written["doc_id"]) & set(
        int(d) for d in contam["doc_id"]
    ), "contaminated docs must not reach the packed output"
    assert not (written["doc_id"] % EVAL_MOD == 0).any(), \
        "the eval split must not be packed as training data"
    print(f"[curate/pack] wrote {len(written)} masked, decontaminated, "
          f"packed rows to {out} (partitioned by chunk_block)")

    # round-4 additions: the monitoring + retrieval layer over the
    # curated corpus — blocked edit-distance ER pairs, hybrid RRF
    # retrieval, the KLL rank sketch and the KS drift monitor
    from raycrawl.ops.relops4 import (
        caption_edit_distance_neardups,
        event_value_ks_drift,
        funnel_time_to_convert,
        rrf_fused_topk,
    )
    from raycrawl.ops.sketches_ops import kll_value_quantiles

    ed = as_df(caption_edit_distance_neardups(sf_dir))
    print(f"[dedup/edit-distance] {len(ed)} blocked near-dup pairs "
          f"(max dist {int(ed['edit_dist'].max()) if len(ed) else '-'})")
    fused = as_df(rrf_fused_topk(sf_dir))
    both = int(((fused['lex_rank'] > 0) & (fused['sem_rank'] > 0)).sum())
    print(f"[retrieve/rrf] top-{len(fused)} hybrid docs, "
          f"{both} ranked by both retrievers")
    kq = as_df(kll_value_quantiles(sf_dir))
    print(f"[monitor/kll] p50={float(kq.loc[kq['quantile']=='p50','value'].iloc[0]):.2f} "
          f"over n={int(kq['n'].iloc[0])} (sketch, no sort)")
    ks = as_df(event_value_ks_drift(sf_dir))
    print(f"[monitor/ks-drift] max drift "
          f"{float(ks['ks_stat'].max()):.4f} across {len(ks)} event types")
    fl = as_df(funnel_time_to_convert(sf_dir))
    for r in fl.itertuples():
        print(f"[monitor/funnel] {r.transition}: {r.n_users} users, "
              f"mean {r.mean_latency_s:.1f}s")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
