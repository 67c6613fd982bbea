"""Opt-in larger-scale parity run (set RAYCRAWL_SLOW=1):

    RAYCRAWL_SLOW=1 python -m pytest tests/test_scale_parity.py -q

~1,400-page universe, 6 shards, spill + global dedup enabled — the full
feature matrix at a size where every code path (spill reload, cross-host
suppression, fetch errors, multi-chunk routing) fires many times.
"""

import os

import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

pytestmark = pytest.mark.skipif(
    not os.environ.get("RAYCRAWL_SLOW"), reason="set RAYCRAWL_SLOW=1 to run"
)


def _sort_log(log):
    return sorted(
        log,
        key=lambda r: (r["epoch"], -r["priority"], r["depth"], r["discovered_at"],
                       r["url_hash"]),
    )


def test_large_parity_all_features(ray_session, tmp_path):
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=24, pages_per_host=60, cross_host_dup=True)
    o = oracle_crawl(
        web, seed_urls(web), max_epochs=80, num_shards=6,
        global_phash_dedup=True, num_phash_shards=5,
    )
    cfg = CrawlConfig(
        web=web, out_dir=str(tmp_path / "big"), num_shards=6, max_epochs=80,
        global_phash_dedup=True, num_phash_shards=5,
        frontier_spill_threshold=6, collect_parity_outputs=True,
    )
    stats = run_crawl(cfg, seed_urls(web))
    assert _sort_log(o.fetch_log) == _sort_log(stats.fetch_log)
    assert {s: sorted(v) for s, v in o.seen.items()} == {
        s: sorted(v) for s, v in stats.seen.items()
    }
    for s in range(6):
        eng = {k: stats.metrics[s][k] for k in o.metrics[s]}
        assert eng == o.metrics[s]
