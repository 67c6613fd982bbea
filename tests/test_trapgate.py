"""Crawler-trap detection: urltools.trap_reason unit contract, engine⋄oracle
parity with the gate on, unfiltered-growth vs filtered-containment, and
manifest round-trip of the gate flag through checkpoint restore."""

import pytest

from raycrawl.core.urltools import canonicalize_url, trap_reason
from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

WEB = WebConfig(n_hosts=4, pages_per_host=12, trap_links=True)
SHARDS = 2
EPOCHS = 12


def test_trap_reason_shapes():
    assert trap_reason("http://h.test/a/b/c/d/e/f") == "deep"
    assert trap_reason("http://h.test/cal/2024/cal/x") == "repeat"
    assert trap_reason("http://h.test/p?a=1&b=2&c=3") == "params"
    assert trap_reason("http://h.test/p/1") is None
    assert trap_reason("http://h.test/") is None
    assert trap_reason("http://h.test/p?a=1&b=2") is None
    # the synthetic trap link shape is caught at its FIRST level
    # (6 segments → 'deep' fires before 'repeat' in the reason order)
    assert trap_reason("http://h0.web.test/cal/2024/cal/2024/p/0") == "deep"


def test_trap_links_universe_deterministic():
    from raycrawl.core.webgraph import page_for

    p1 = page_for(WEB, "http://h0.web.test/p/0")
    p2 = page_for(WEB, "http://h0.web.test/p/0")
    assert p1.outlinks == p2.outlinks
    assert p1.outlinks[-1] == "http://h0.web.test/cal/2024/cal/2024/p/0"
    # trap spelling is a DISTINCT page: own content, next-level trap link
    t = page_for(WEB, canonicalize_url(p1.outlinks[-1]))
    assert t.image_id != p1.image_id
    assert t.outlinks[-1].count("cal/2024/") == 4


def test_oracle_trap_filter_contains_growth():
    free = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS)
    gated = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                         num_shards=SHARDS, trap_filter=True)
    n_trap_free = sum("cal/2024/" in r["url"] for r in free.fetch_log
                      if r["status"] == "fetched")
    assert n_trap_free > 0, "unfiltered crawl must walk into the trap"
    assert all("cal/2024/" not in r["url"] for r in gated.fetch_log
               if r["status"] == "fetched")
    denied = sum(m["trap_denied"] for m in gated.metrics.values())
    assert denied > 0
    assert sum(m["trap_denied"] for m in free.metrics.values()) == 0


@pytest.fixture(scope="module")
def gated_pair(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("trap") / "out")
    cfg = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                      max_epochs=EPOCHS, trap_filter=True,
                      collect_parity_outputs=True)
    stats = run_crawl(cfg, seed_urls(WEB))
    oracle = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                          num_shards=SHARDS, trap_filter=True)
    return stats, oracle, out


def _sort_log(log):
    return sorted(
        log,
        key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                       r["discovered_at"], r["url_hash"]),
    )


def test_engine_trap_parity(gated_pair):
    stats, oracle, _ = gated_pair
    assert _sort_log(stats.fetch_log) == _sort_log(oracle.fetch_log)
    assert {s: sorted(v) for s, v in stats.seen.items()} == {
        s: sorted(v) for s, v in oracle.seen.items()}
    for s in range(SHARDS):
        eng = {k: stats.metrics[s][k] for k in oracle.metrics[s]}
        assert eng == oracle.metrics[s], f"shard {s}"
    assert sum(m["trap_denied"] for m in oracle.metrics.values()) > 0


def test_trap_filter_survives_restore(gated_pair):
    import os

    from raycrawl.crawler import latest_checkpoint_epoch
    from raycrawl.frontier.shard import FrontierShard

    _, _, out = gated_pair
    ckpt = os.path.join(out, "checkpoints")
    epoch = latest_checkpoint_epoch(out)
    sh = FrontierShard.restore(ckpt, epoch, 0)
    assert sh.trap_filter is True
    assert sh.metrics["trap_denied"] >= 0
    # a restored shard keeps denying trap offers
    from raycrawl.core.urltools import url_sha1

    url = "http://h0.web.test/cal/2024/cal/2024/p/999"
    before = sh.metrics["trap_denied"]
    sh.offer(("t", 0), [url], [url_sha1(url)], ["h0.web.test"], [5], [1], 99)
    sh._merge_pending()
    assert sh.metrics["trap_denied"] == before + 1


def test_fetch_cache_keyed_on_full_config(ray_session, tmp_path):
    """Regression: two crawls in ONE Ray session with configs differing
    only in a field the old partial cache key ignored (trap_links) must
    not share a FetchWorker — the second crawl silently crawled the
    trap-free universe and recorded zero denials."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    plain = WebConfig(n_hosts=4, pages_per_host=12)
    run_crawl(CrawlConfig(web=plain, out_dir=str(tmp_path / "a"),
                          num_shards=SHARDS, max_epochs=EPOCHS),
              seed_urls(plain))
    trappy = WebConfig(n_hosts=4, pages_per_host=12, trap_links=True)
    stats = run_crawl(
        CrawlConfig(web=trappy, out_dir=str(tmp_path / "b"),
                    num_shards=SHARDS, max_epochs=EPOCHS, trap_filter=True),
        seed_urls(trappy))
    assert sum(m.get("trap_denied", 0) for m in stats.metrics) > 0


def test_trap_gate_metrics_query(ray_session):
    from raycrawl.ops import REGISTRY

    df = REGISTRY["crawl_trap_gate_metrics"]["fn"]("/root/testdata/sf0.001")
    assert df["trap_denied"].sum() > 0
    assert (df["offered"] >= df["accepted"]).all()
