"""Benchmark harness. Prints ONE JSON line:

  {"metric": "bench_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "num_cpus": N,
   "crawl_urls_per_sec": ..., "frontier_ops_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).

``--scaling`` runs the headline crawl pipeline in two fresh processes
(num_cpus=8 and 32) on the same input and reports both throughputs plus
scaling efficiency — the sandbox evidence for the north rule's
two-cluster-size criterion (N vs 4N).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "events_per_minute",
    "hourly_user_windows",
    "topic_routing_counts",
    "doc_quality_scores",
    "exact_dedup_by_hash",
    "minhash_lsh_candidates",
    "simhash_dedup_groups",
    "ann_bruteforce_topk",
    "image_feature_extract",
    "audio_feature_extract",
]


def _consume(result):
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.count()
    if isinstance(result, pa.Table):
        return result.num_rows
    return len(result)


def crawl_bench(sf_dir: str):
    """Headline: the crawl engine over a universe sized from the sf.
    Returns (seconds, urls_fetched, frontier_ops)."""
    import pyarrow.parquet as pq

    from raycrawl.core.webgraph import WebConfig, seed_urls
    from raycrawl.crawler import CrawlConfig, run_crawl

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_hosts = 64
    web = WebConfig(n_hosts=n_hosts, pages_per_host=max(4, n_docs // n_hosts))
    cfg = CrawlConfig(
        web=web,
        out_dir=f"/tmp/raycrawl_bench_{NUM_CPUS}",
        num_shards=8,
        max_epochs=40,
        epoch_seconds=30.0,
        saving_period=20,
        fetch_concurrency=max(2, NUM_CPUS // 4),
        decode_concurrency=max(2, NUM_CPUS // 4),
        keep_bytes_in_payload=True,
    )
    t0 = time.time()
    stats = run_crawl(cfg, seed_urls(web, n_hosts))
    dt = time.time() - t0
    ops = sum(m["offered"] for m in stats.metrics) + stats.fetched
    return dt, stats.payload_rows, ops


def main():
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()

    # warm OS page cache (untimed) so we measure compute + shuffle
    for name in ("lineitem", "events", "documents", "embeddings"):
        with open(os.path.join(SF_DIR, f"{name}.parquet"), "rb") as f:
            f.read()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name in BENCH_QUERIES:
        t0 = time.time()
        _consume(qs[name](SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    crawl_sec, urls, ops = crawl_bench(SF_DIR)
    timings["crawl"] = round(crawl_sec, 3)
    total = round(time.time() - t_all, 3)

    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": round(urls / crawl_sec, 2),
        "frontier_ops_per_sec": round(ops / crawl_sec, 2),
        "crawl_urls": urls,
    }
    ray.shutdown()
    print(json.dumps(out))


def scaling():
    """Fresh-process runs at num_cpus=8 and 32 → throughput + efficiency."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tput_lo = lo["crawl_urls_per_sec"]
    tput_hi = hi["crawl_urls_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "fraction",
                "crawl_urls_per_sec_8cpu": tput_lo,
                "crawl_urls_per_sec_32cpu": tput_hi,
                "bench_total_8cpu": lo["value"],
                "bench_total_32cpu": hi["value"],
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
