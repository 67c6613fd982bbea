"""Kitchen-sink parity: EVERY crawl feature on at once — trap links +
trap filter, 301 redirects, depth cap, lifetime host quota, error
backoff, pop budget, host priority boosts, cross-host near-dups, link
log, mid-crawl seed injection — and the engine still matches the
sequential oracle exactly (ordering, seen sets, metrics). Features are
individually parity-tested elsewhere; this guards their composition."""

import pytest

from raycrawl.core.webgraph import WebConfig, page_url, seed_urls
from raycrawl.oracle import oracle_crawl

WEB = WebConfig(n_hosts=8, pages_per_host=18, trap_links=True,
                redirect_every=3, cross_host_dup=True)
SHARDS = 4
EPOCHS = 40
BOOSTS = {"h1.web.test": 2, "h5.web.test": 1}
KW = dict(trap_filter=True, max_depth=5, max_pages_per_host=10,
          error_backoff=True, epoch_pop_budget=6,
          host_priority_boost=BOOSTS,
          # round-5: injection composes with every other gate (the
          # injected URLs run the same trap/depth/quota/robots merge)
          seed_injections={3: [page_url(7, 1)],
                           6: [page_url(0, 0), page_url(2, 4)]})


def _key(r):
    return (r["epoch"], -r["priority"], r["depth"], r["discovered_at"],
            r["url_hash"])


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    o = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                     num_shards=SHARDS, **KW)
    out = str(tmp_path_factory.mktemp("ks") / "out")
    cfg = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                      max_epochs=EPOCHS, collect_parity_outputs=True,
                      link_log=True, **KW)
    s = run_crawl(cfg, seed_urls(WEB))
    return o, s


def test_kitchen_sink_ordering_parity(pair):
    o, s = pair
    assert sorted(o.fetch_log, key=_key) == sorted(s.fetch_log, key=_key)


def test_kitchen_sink_seen_and_metrics_parity(pair):
    o, s = pair
    assert {k: sorted(v) for k, v in o.seen.items()} == {
        k: sorted(v) for k, v in s.seen.items()
    }
    for sh in range(SHARDS):
        eng = {k: s.metrics[sh][k] for k in o.metrics[sh]}
        assert eng == o.metrics[sh], f"shard {sh}"


def test_kitchen_sink_every_feature_fired(pair):
    """The composition is only meaningful if each gate actually acted."""
    o, _ = pair
    tot = {k: sum(m[k] for m in o.metrics.values()) for k in o.metrics[0]}
    assert tot["trap_denied"] > 0
    assert tot["redirects_followed"] > 0
    assert tot["depth_denied"] > 0
    assert tot["quota_denied"] + tot["quota_dropped"] > 0
    assert tot["phash_suppressed"] > 0
    assert tot["fetch_errors"] > 0
