"""The crawl operator's loop, end to end on the synthetic web:

  1. generation-0 crawl (politeness, robots, traps, redirects, depth cap)
  2. inspect — run summary from manifests + parquet footers (no Ray)
  3. generation-1 crawl of the CHANGED web, conditional-fetched against
     gen-0's etag manifest (unchanged pages 304, no re-store)
  4. per-host change rates + the freshness boost plan for generation 2
  5. federated splice: merge a second crawler's checkpoint and resume
     the union frontier without refetching either side's coverage

Run: python examples/crawl_operations.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ROOT = os.path.join(tempfile.gettempdir(), "raycrawl_ops_demo")


def main() -> None:
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    ray.data.DataContext.get_current().enable_progress_bars = False

    from raycrawl.core.webgraph import WebConfig, seed_urls
    from raycrawl.crawler import (CrawlConfig, inspect_run, read_payload,
                                  run_crawl)
    from raycrawl.frontier.merge import merge_checkpoints
    from raycrawl.ops.crawlq import host_change_rates, recrawl_boost_plan

    shutil.rmtree(ROOT, ignore_errors=True)
    g0, g1, ga, gm = (os.path.join(ROOT, d) for d in ("g0", "g1", "a", "m"))

    # 1. generation 0: a full-feature crawl
    web0 = WebConfig(n_hosts=12, pages_per_host=20, trap_links=True,
                     redirect_every=4)
    cfg0 = CrawlConfig(web=web0, out_dir=g0, num_shards=4, max_epochs=40,
                       trap_filter=True, max_depth=6)
    s0 = run_crawl(cfg0, seed_urls(web0))
    print(f"[gen0] epochs={s0.epochs} stored={s0.payload_rows} "
          f"redirects={sum(m['redirects_followed'] for m in s0.metrics)} "
          f"traps_denied={sum(m['trap_denied'] for m in s0.metrics)}")

    # 2. inspect: the no-Ray ops summary
    info = inspect_run(g0)
    print(f"[inspect] net_payload={info['payload_rows_net']} "
          f"sidecars={info['sidecar_rows']} "
          f"hosts_with_spend={info['hosts_with_spend']}")

    # 3. generation 1: the web changed; 304 the unchanged pages
    web1 = WebConfig(n_hosts=12, pages_per_host=20, trap_links=True,
                     redirect_every=4, content_epoch=1)
    cfg1 = CrawlConfig(web=web1, out_dir=g1, num_shards=4, max_epochs=40,
                       trap_filter=True, max_depth=6, etag_manifest_dir=g0)
    s1 = run_crawl(cfg1, seed_urls(web1))
    nm = sum(m["not_modified"] for m in s1.metrics)
    print(f"[gen1] stored={s1.payload_rows} not_modified={nm} "
          f"(unchanged pages skipped, link graph still walked)")

    # 4. freshness plan for generation 2
    rates = host_change_rates(g0, g1).to_pandas()
    boosts = recrawl_boost_plan(g0, g1)
    churny = rates.sort_values("change_rate", ascending=False).head(3)
    print("[plan] churniest hosts:",
          [(r.host, float(r.change_rate)) for r in churny.itertuples()])
    print(f"[plan] boosts for gen2 --host-boosts: {boosts}")

    # 5. federated splice: a second crawler covered different seeds;
    # merge both checkpoints and resume the union frontier
    cfg_a = CrawlConfig(web=web0, out_dir=ga, num_shards=4, max_epochs=3,
                        trap_filter=True)
    run_crawl(cfg_a, seed_urls(web0)[:4])
    cfg_b = CrawlConfig(web=web0, out_dir=os.path.join(ROOT, "b"),
                        num_shards=4, max_epochs=3, trap_filter=True)
    run_crawl(cfg_b, seed_urls(web0)[6:])
    merge_checkpoints(ga, os.path.join(ROOT, "b"), gm)
    cfg_m = CrawlConfig(web=web0, out_dir=gm, num_shards=4, max_epochs=60,
                        trap_filter=True)
    run_crawl(cfg_m, [], resume=True)
    new_rows = len(read_payload(gm).to_pandas())
    union_rows = (len(read_payload(ga).to_pandas())
                  + len(read_payload(os.path.join(ROOT, "b")).to_pandas())
                  + new_rows)
    print(f"[merge] resumed union crawl: +{new_rows} new rows; "
          f"union corpus across the three payload trees = {union_rows}")

    ray.shutdown()


if __name__ == "__main__":
    main()
