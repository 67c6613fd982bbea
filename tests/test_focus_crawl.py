"""Focused crawl (CrawlConfig.focus_keywords): outlinks propagate only
from pages whose caption contains a focus keyword — the reference's
topic-keyword crawl semantics (pages/Crawler.py topic search + the
isabout containment predicate) made a crawl-engine feature. Parity,
inertness when unset, and the focus actually narrowing coverage."""

import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

WEB = WebConfig(n_hosts=8, pages_per_host=24)
SHARDS = 3
EPOCHS = 50
# two mid-frequency caption words (webgraph._WORDS): enough matching pages
# that the focused crawl still spreads, few enough that it provably
# narrows coverage
FOCUS = ("cedar", "quartz")


def _sort_log(log):
    return sorted(
        log,
        key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                       r["discovered_at"], r["url_hash"]),
    )


@pytest.fixture(scope="module")
def oracle_focus():
    return oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS, focus_keywords=FOCUS)


@pytest.fixture(scope="module")
def engine_focus(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("focus") / "out")
    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=EPOCHS,
        focus_keywords=FOCUS, collect_parity_outputs=True,
    )
    return run_crawl(cfg, seed_urls(WEB))


def test_focus_ordering_parity(oracle_focus, engine_focus):
    assert _sort_log(oracle_focus.fetch_log) == _sort_log(
        engine_focus.fetch_log
    )


def test_focus_seen_parity(oracle_focus, engine_focus):
    assert {s: sorted(v) for s, v in oracle_focus.seen.items()} == {
        s: sorted(v) for s, v in engine_focus.seen.items()
    }


def test_focus_metrics_parity(oracle_focus, engine_focus):
    for s in range(SHARDS):
        eng = {k: engine_focus.metrics[s][k] for k in oracle_focus.metrics[s]}
        assert eng == oracle_focus.metrics[s], f"shard {s}"


def test_focus_narrows_coverage():
    """In a suppression-free universe (neardup_every=1 — phash
    suppression makes fetched sets non-monotone across configs, since a
    page skipped by the focus can be the near-dup that suppressed
    another) the focused fetched set is a strict subset of the
    unfocused one, yet still bigger than the seed list."""
    web = WebConfig(n_hosts=8, pages_per_host=24, neardup_every=1)
    focus = oracle_crawl(web, seed_urls(web), max_epochs=EPOCHS,
                         num_shards=SHARDS, focus_keywords=FOCUS)
    base = oracle_crawl(web, seed_urls(web), max_epochs=EPOCHS,
                        num_shards=SHARDS)
    f_focus = {r["url_hash"] for r in focus.fetch_log
               if r["status"] == "fetched"}
    f_base = {r["url_hash"] for r in base.fetch_log
              if r["status"] == "fetched"}
    assert f_focus < f_base
    assert len(f_focus) > len(seed_urls(web))


def test_focus_none_is_inert(ray_session, tmp_path):
    from raycrawl.crawler import CrawlConfig, run_crawl

    a = oracle_crawl(WEB, seed_urls(WEB), max_epochs=10, num_shards=SHARDS)
    cfg = CrawlConfig(
        web=WEB, out_dir=str(tmp_path / "inert"), num_shards=SHARDS,
        max_epochs=10, collect_parity_outputs=True,
    )
    stats = run_crawl(cfg, seed_urls(WEB))
    assert _sort_log(a.fetch_log) == _sort_log(stats.fetch_log)


def test_crawl_focus_yield_query(ray_session):
    """The registry audit's self-reported numbers must be internally
    consistent: focused fetches strictly fewer pages (savings > 0),
    on-topic counts bounded by fetched counts, fractions consistent."""
    from raycrawl.ops import REGISTRY

    t = REGISTRY["crawl_focus_yield"]["fn"]("/root/testdata/sf0.001")
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    r = df.iloc[0]
    assert r["fetched_focus"] < r["fetched_plain"]
    assert r["fetch_savings_frac"] > 0
    assert 0 <= r["on_topic_focus"] <= r["fetched_focus"]
    assert 0 <= r["on_topic_plain"] <= r["fetched_plain"]
    assert abs(
        r["on_topic_frac_focus"] - r["on_topic_focus"] / r["fetched_focus"]
    ) < 1e-5
