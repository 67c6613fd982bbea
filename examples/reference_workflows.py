"""End-to-end walkthrough: every workflow a reference user runs, on raycrawl.

    python examples/reference_workflows.py [sf_dir]

Maps 1:1 onto the reference's pages (SURVEY.md §3):
  Crawler            → run_crawl over the synthetic web
  Preprocess         → dump flatten + topic routing counts
  Stance Detection   → iterative label propagation
  Location Detection → ordered-dictionary location normalization
  User Dashboard     → composite user-stats table + histograms
  Visualization      → per-minute label counts
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

    # 1. Crawler — fetch loop with politeness/robots/seen/phash gating
    from raycrawl.core.webgraph import WebConfig, seed_urls
    from raycrawl.crawler import CrawlConfig, run_crawl, read_payload

    web = WebConfig(n_hosts=6, pages_per_host=12)
    cfg = CrawlConfig(web=web, out_dir="/tmp/raycrawl_example", num_shards=4,
                      max_epochs=30)
    stats = run_crawl(cfg, seed_urls(web))
    payload = read_payload(cfg.out_dir)
    print(f"[crawler] epochs={stats.epochs} payload_rows={payload.count()} "
          f"metrics[0]={stats.metrics[0]}")

    # 2. Preprocess — flatten nested dump records, route by topic/lang
    from raycrawl.pipelines.reference_analogs import dump_flatten_route_counts
    from raycrawl.ops.textops import topic_routing_counts

    print("[preprocess] ref_type counts:")
    print(dump_flatten_route_counts(sf_dir).to_pandas().head(6).to_string())
    print("[preprocess] topic routing:")
    print(topic_routing_counts(sf_dir).to_pandas().head(6).to_string())

    # 3. Stance detection — iterative label propagation with margin rule
    from raycrawl.pipelines.reference_analogs import label_propagation

    labels = label_propagation(sf_dir)
    print(f"[stance] labeled users: {len(labels)}; "
          f"histogram: {labels['label'].value_counts().to_dict()}")

    # 4. Location detection — ordered bidirectional-substring normalization
    from raycrawl.pipelines.reference_analogs import location_normalize_counts

    print("[location] normalized counts:")
    print(location_normalize_counts(sf_dir).to_pandas().head(5).to_string())

    # 5. User dashboard — composite per-user stats table
    from raycrawl.pipelines.dashboards import user_stats_table

    users = user_stats_table(sf_dir).to_pandas()
    print(f"[dashboard] user rows: {len(users)}; "
          f"stance histogram: {users['stance'].value_counts().to_dict()}")

    # 6. Visualization — per-minute per-label time series
    from raycrawl.pipelines.dashboards import temporal_label_counts

    ts = temporal_label_counts(sf_dir).to_pandas()
    print(f"[visualization] time-series rows: {len(ts)}")

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
