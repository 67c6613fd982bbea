"""Crawl-depth cap (--max-depth): offers deeper than the cap are denied at
offer-merge time (deny-and-seen, matching the robots/trap precedent), with
exact engine-vs-oracle parity, correct interaction with redirects (targets
inherit the alias depth, so a redirect AT the cap is still followed), and
the cap following the run across resume."""

import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

WEB = WebConfig(n_hosts=6, pages_per_host=20)
SHARDS = 4
EPOCHS = 40
CAP = 2


def _key(r):
    return (r["epoch"], -r["priority"], r["depth"], r["discovered_at"],
            r["url_hash"])


@pytest.fixture(scope="module")
def oracle():
    return oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS, max_depth=CAP)


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("depth") / "out")
    cfg = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                      max_epochs=EPOCHS, max_depth=CAP,
                      collect_parity_outputs=True)
    return run_crawl(cfg, seed_urls(WEB))


def test_depth_cap_parity(oracle, engine):
    assert sorted(oracle.fetch_log, key=_key) == sorted(engine.fetch_log,
                                                        key=_key)
    assert {s: sorted(v) for s, v in oracle.seen.items()} == {
        s: sorted(v) for s, v in engine.seen.items()
    }
    for s in range(SHARDS):
        eng = {k: engine.metrics[s][k] for k in oracle.metrics[s]}
        assert eng == oracle.metrics[s], f"shard {s}"


def test_depth_cap_enforced_and_fires(oracle, engine):
    assert sum(m["depth_denied"] for m in oracle.metrics.values()) > 0
    for r in engine.fetch_log:
        if r["status"] == "fetched":
            assert r["depth"] <= CAP
        if r["status"] == "depth_denied":
            assert r["depth"] > CAP
    # the cap actually bit: an uncapped crawl fetches more
    free = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS)
    assert (sum(m["fetched"] for m in free.metrics.values())
            > sum(m["fetched"] for m in oracle.metrics.values()))


def test_depth_cap_with_redirects(ray_session, tmp_path):
    """Redirect targets inherit the alias depth, so an alias popped AT the
    cap still gets its target admitted — parity must hold with both
    features on."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=5, pages_per_host=15, redirect_every=3)
    o = oracle_crawl(web, seed_urls(web), max_epochs=30, num_shards=SHARDS,
                     max_depth=CAP)
    cfg = CrawlConfig(web=web, out_dir=str(tmp_path / "dr"),
                      num_shards=SHARDS, max_epochs=30, max_depth=CAP,
                      collect_parity_outputs=True)
    s = run_crawl(cfg, seed_urls(web))
    assert sorted(o.fetch_log, key=_key) == sorted(s.fetch_log, key=_key)
    assert sum(m["redirects_followed"] for m in o.metrics.values()) > 0
    assert sum(m["depth_denied"] for m in o.metrics.values()) > 0


def test_depth_cap_follows_resume(ray_session, tmp_path):
    """The cap is config, not checkpoint state: a capped crawl stopped and
    resumed WITH the cap matches the uninterrupted capped crawl."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path / "res")
    cfg1 = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                       max_epochs=4, saving_period=2, max_depth=CAP,
                       collect_parity_outputs=True)
    run_crawl(cfg1, seed_urls(WEB))
    cfg2 = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                       max_epochs=EPOCHS, max_depth=CAP,
                       collect_parity_outputs=True)
    resumed = run_crawl(cfg2, seed_urls(WEB), resume=True)
    o = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                     num_shards=SHARDS, max_depth=CAP)
    assert {s: sorted(v) for s, v in resumed.seen.items()} == {
        s: sorted(v) for s, v in o.seen.items()
    }
