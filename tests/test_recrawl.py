"""Freshness-directed recrawl: WebConfig.content_epoch re-derives the
~1/3 volatile pages' content per crawl generation (stable pages and
content_epoch=0 universes byte-identical); host_change_rates reconciles
exactly with the page_is_volatile ground truth; the recrawl-plan boost
map targets churny hosts and feeds --host-boosts."""

import numpy as np
import pandas as pd
import pytest

from raycrawl.core.webgraph import (WebConfig, page_for, page_is_volatile,
                                    page_url, seed_urls)

WEB0 = WebConfig(n_hosts=6, pages_per_host=16)
WEB1 = WebConfig(n_hosts=6, pages_per_host=16, content_epoch=1)


def test_volatility_is_generation_stable_property():
    vol = {(k, i): page_is_volatile(WEB0, k, i)
           for k in range(6) for i in range(16)}
    assert any(vol.values()) and not all(vol.values())
    # same property regardless of content_epoch
    assert all(page_is_volatile(WEB1, k, i) == v for (k, i), v in vol.items())


def _changes_between_generations(web, k, i, private=False) -> bool:
    """Ground truth: a PUBLIC page's content changes iff it is volatile
    itself, OR it is a near-dup clone whose base page is volatile (clones
    track their base's CURRENT pixels). Private pages never change."""
    if private:
        return False
    if page_is_volatile(web, k, i):
        return True
    return (i % web.neardup_every == 1 and i > 0
            and page_is_volatile(web, k, i - 1))


def test_content_epoch_changes_exactly_the_volatile_pages():
    for k in range(6):
        for i in range(16):
            p0 = page_for(WEB0, page_url(k, i))
            p1 = page_for(WEB1, page_url(k, i))
            same = (p0.caption == p1.caption and p0.data == p1.data
                    and p0.outlinks == p1.outlinks)
            assert same != _changes_between_generations(WEB0, k, i), (k, i)


def test_content_epoch_zero_is_byte_identical():
    """Feature off → the universe is untouched (regression guard for
    every existing parity test)."""
    base = WebConfig(n_hosts=3, pages_per_host=8)
    again = WebConfig(n_hosts=3, pages_per_host=8, content_epoch=0)
    for i in range(8):
        a, b = page_for(base, page_url(1, i)), page_for(again, page_url(1, i))
        assert a.data == b.data and a.outlinks == b.outlinks


def test_neardup_clone_tracks_volatile_base():
    """A near-dup page clones its base's CURRENT pixels: when the base is
    volatile, the clone's pixels change with the generation too (the
    phash gate keeps seeing them as near-dups within each generation)."""
    web0 = WebConfig(n_hosts=2, pages_per_host=30)
    web1 = WebConfig(n_hosts=2, pages_per_host=30, content_epoch=1)
    found = False
    for k in range(2):
        for i in range(1, 30):
            if i % web0.neardup_every == 1 and page_is_volatile(web0, k, i - 1):
                clone0 = page_for(web0, page_url(k, i))
                clone1 = page_for(web1, page_url(k, i))
                base1 = page_for(web1, page_url(k, i - 1))
                assert clone0.data != clone1.data
                # still a near-dup of its base within generation 1
                assert abs(int(clone1.phash) - int(base1.phash)) >= 0
                d = np.abs(clone1.pixels.astype(int)
                           - base1.pixels.astype(int))
                assert d.max() <= 1
                found = True
    assert found


@pytest.fixture(scope="module")
def two_generations(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    root = tmp_path_factory.mktemp("gen")
    outs = []
    for web in (WEB0, WEB1):
        out = str(root / f"g{web.content_epoch}")
        cfg = CrawlConfig(web=web, out_dir=out, num_shards=4, max_epochs=30)
        run_crawl(cfg, seed_urls(web))
        outs.append(out)
    return outs


def test_host_change_rates_match_volatility_ground_truth(ray_session,
                                                         two_generations):
    """Every changed common URL is a volatile page; every unchanged one is
    stable — exact reconciliation against page_is_volatile."""
    from raycrawl.crawler import read_payload
    from raycrawl.ops.crawlq import host_change_rates

    out0, out1 = two_generations
    rates = host_change_rates(out0, out1).to_pandas()
    assert (rates["n_changed"] <= rates["n_common"]).all()
    assert (rates["n_changed"] > 0).any()

    # ground truth over the common fetched URL set
    a = read_payload(out0, columns=["url", "phash", "caption"]).to_pandas()
    b = read_payload(out1, columns=["url", "phash", "caption"]).to_pandas()
    m = a.merge(b, on="url", suffixes=("", "_b"))

    def vol(url):
        rest = url.split("://", 1)[1]
        k = int(rest.split(".")[0][1:])
        i = int(rest.rsplit("/", 1)[1])
        private = "/private/" in url
        return _changes_between_generations(WEB0, k, i, private)

    changed = (m["phash"] != m["phash_b"]) | (m["caption"] != m["caption_b"])
    is_vol = m["url"].map(vol)
    # truly-stable pages can never change; caption changes exactly with
    # the content reseed. phash alone may coincide for a changed clone,
    # but the caption carries the image_id-derived prefix, so the
    # combined detector is exact.
    assert not (changed & ~is_vol).any()
    assert (changed == is_vol).all()
    want_changed = int(changed.sum())
    assert int(rates["n_changed"].sum()) == want_changed
    assert int(rates["n_common"].sum()) == len(m)


def test_recrawl_boost_plan_targets_churny_hosts(ray_session,
                                                 two_generations):
    from raycrawl.ops.crawlq import host_change_rates, recrawl_boost_plan

    out0, out1 = two_generations
    rates = host_change_rates(out0, out1).to_pandas()
    boosts = recrawl_boost_plan(out0, out1)
    assert set(boosts) <= set(rates["host"])
    assert set(boosts.values()) <= {1, 2}
    if boosts:
        by_host = dict(zip(rates["host"], rates["change_rate"]))
        boosted = min(by_host[h] for h in boosts)
        unboosted = [by_host[h] for h in rates["host"] if h not in boosts]
        if unboosted:
            assert boosted >= max(0.0, np.median(list(by_host.values())))


def test_change_rate_registry_entry(ray_session):
    from raycrawl.ops import REGISTRY

    t = REGISTRY["crawl_change_rate_by_host"]["fn"](
        "/root/testdata/sf0.001"
    ).to_pandas()
    assert len(t) > 0 and (t["n_changed"] > 0).any()
    assert ((t["change_rate"] >= 0) & (t["change_rate"] <= 1)).all()
