"""Conditional fetch (HTTP 304 analog): a recrawl against a previous
generation's etag manifest marks content-identical pages not_modified —
token spent, no payload row, no phash-index entry, no expansion — with
exact engine-vs-oracle parity, a fourth sidecar tree preserving the
popped-set partition invariant, and read_payload excluding 304 rows (the
previous generation's row is authoritative)."""

import os

import pandas as pd
import pytest

from raycrawl.core.codec import content_etag
from raycrawl.core.urltools import url_sha1
from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

WEB0 = WebConfig(n_hosts=6, pages_per_host=16)
WEB1 = WebConfig(n_hosts=6, pages_per_host=16, content_epoch=1)
SHARDS = 4
EPOCHS = 30


def _key(r):
    return (r["epoch"], -r["priority"], r["depth"], r["discovered_at"],
            r["url_hash"])


def _oracle_manifest(result) -> dict[bytes, bytes]:
    return {
        url_sha1(p["url"]): content_etag(p["w"], p["h"], p["fmt"],
                                         p["phash"], p["caption"])
        for p in result.payload
    }


@pytest.fixture(scope="module")
def gen0(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("cf") / "g0")
    cfg = CrawlConfig(web=WEB0, out_dir=out, num_shards=SHARDS,
                      max_epochs=EPOCHS)
    run_crawl(cfg, seed_urls(WEB0))
    o = oracle_crawl(WEB0, seed_urls(WEB0), max_epochs=EPOCHS,
                     num_shards=SHARDS)
    return out, o


@pytest.fixture(scope="module")
def gen1(ray_session, gen0, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    out0, o0 = gen0
    out = str(tmp_path_factory.mktemp("cf") / "g1")
    cfg = CrawlConfig(web=WEB1, out_dir=out, num_shards=SHARDS,
                      max_epochs=EPOCHS, etag_manifest_dir=out0,
                      collect_parity_outputs=True)
    stats = run_crawl(cfg, seed_urls(WEB1))
    o1 = oracle_crawl(WEB1, seed_urls(WEB1), max_epochs=EPOCHS,
                      num_shards=SHARDS, etag_manifest=_oracle_manifest(o0))
    payload = read_payload(out).to_pandas()
    return out, stats, o1, payload


def test_conditional_fetch_parity(gen1):
    _, stats, o1, _ = gen1
    assert sorted(o1.fetch_log, key=_key) == sorted(stats.fetch_log,
                                                    key=_key)
    for s in range(SHARDS):
        eng = {k: stats.metrics[s][k] for k in o1.metrics[s]}
        assert eng == o1.metrics[s], f"shard {s}"
    assert sum(m["not_modified"] for m in o1.metrics.values()) > 0


def test_not_modified_rows_excluded_from_payload(gen1):
    _, stats, o1, payload = gen1
    nm_urls = {r["url"] for r in stats.fetch_log
               if r["status"] == "not_modified"}
    assert nm_urls and not (payload["url"].isin(nm_urls)).any()
    # payload matches the oracle's exactly (oracle emits no 304 rows)
    want = {p["image_id"] for p in o1.payload}
    assert set(payload["image_id"]) == want


def test_not_modified_sidecar_partitions_pops(gen1):
    from raycrawl.frontier.merge import _popped_digest_hosts

    out, stats, _, _ = gen1
    popped = _popped_digest_hosts(out, stats.epochs - 1)
    pop_statuses = {"fetched", "dup_suppressed", "fetch_error",
                    "redirected", "not_modified"}
    want = {r["url_hash"] for r in stats.fetch_log
            if r["status"] in pop_statuses}
    assert {d.hex() for d in popped} == want
    nm_files = os.listdir(os.path.join(out, "not_modified"))
    assert nm_files


def test_volatile_pages_are_refetched(gen1):
    """Changed (volatile) pages must NOT be 304'd: generation 1's payload
    contains every changed common page with its NEW content."""
    from raycrawl.core.webgraph import page_for

    _, stats, _, payload = gen1
    fetched = payload.set_index("url")
    changed = 0
    for url in fetched.index:
        p1 = page_for(WEB1, url)
        p0 = page_for(WEB0, url)
        assert fetched.loc[url, "caption"] == p1.caption
        if p0.caption != p1.caption:
            changed += 1
    assert changed > 0


def test_self_recrawl_stores_nothing_twice(ray_session, tmp_path):
    """Recrawling the SAME static web against its own manifest marks every
    previously-stored page not_modified, and no stored page is re-stored.
    (Pages gen-0 near-dup-SUPPRESSED are not in the manifest — they carry
    no payload row — so gen-1 may legitimately store them and explore
    their subtrees: the phash gate is per-generation.)"""
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    out0 = str(tmp_path / "a")
    cfg0 = CrawlConfig(web=WEB0, out_dir=out0, num_shards=SHARDS,
                       max_epochs=EPOCHS)
    run_crawl(cfg0, seed_urls(WEB0))
    p0 = read_payload(out0).to_pandas()

    out1 = str(tmp_path / "b")
    cfg1 = CrawlConfig(web=WEB0, out_dir=out1, num_shards=SHARDS,
                       max_epochs=EPOCHS, etag_manifest_dir=out0)
    stats = run_crawl(cfg1, seed_urls(WEB0))
    p1 = read_payload(out1).to_pandas()
    nm = sum(m["not_modified"] for m in stats.metrics)
    assert nm == len(p0)  # every gen-0 payload page 304s
    # no re-store: the generations' stored sets are disjoint
    assert not (set(p1["image_id"]) & set(p0["image_id"]))


def test_crawl_incremental_audit_registry(ray_session):
    """Registry audit reconciles the conditional-fetch contract from the
    artifacts alone: metric == sidecar rows, and NO unchanged page is
    ever stored twice (a nonzero restored_unchanged means the 304 gate
    leaked)."""
    from raycrawl.ops import REGISTRY

    t = REGISTRY["crawl_incremental_audit"]["fn"](
        "/root/testdata/sf0.001"
    ).to_pandas().iloc[0]
    assert t["not_modified"] == t["nm_sidecar_rows"] > 0
    assert t["restored_unchanged"] == 0
    assert t["restored_changed"] > 0  # the volatile third was refetched


def test_change_rates_count_304_pages_as_unchanged_common(ray_session,
                                                          gen0, gen1):
    """host_change_rates over a CONDITIONAL generation: 304'd pages count
    as unchanged-common (via B's not_modified sidecar), so the rate
    reflects real churn (~1/3 volatility), not the trivial 1.0 a
    payload-only join would produce."""
    import numpy as np

    from raycrawl.ops.crawlq import host_change_rates

    out0, _ = gen0
    out1, stats, _, _ = gen1
    t = host_change_rates(out0, out1).to_pandas()
    nm = sum(m["not_modified"] for m in stats.metrics)
    assert int(t["n_common"].sum()) >= nm  # every 304 is common
    assert float(t["change_rate"].mean()) < 0.9  # not the trivial 1.0
    assert (t["n_changed"] <= t["n_common"]).all()


def test_chained_generations_carry_etags_forward(ray_session, tmp_path):
    """gen0 → gen1 (manifest gen0) → gen2 (manifest gen1): pages unchanged
    since gen0 have no payload row in gen1, so gen2's manifest must union
    the CHAIN (generation.json breadcrumbs) or it silently re-stores them.
    Pins exact oracle parity under the union manifest and the
    'never re-store unchanged' invariant across all three generations."""
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    WEB2 = WebConfig(n_hosts=6, pages_per_host=16, content_epoch=2)
    out = {g: str(tmp_path / f"g{g}") for g in range(3)}
    run_crawl(CrawlConfig(web=WEB0, out_dir=out[0], num_shards=SHARDS,
                          max_epochs=EPOCHS), seed_urls(WEB0))
    run_crawl(CrawlConfig(web=WEB1, out_dir=out[1], num_shards=SHARDS,
                          max_epochs=EPOCHS, etag_manifest_dir=out[0]),
              seed_urls(WEB1))
    stats2 = run_crawl(
        CrawlConfig(web=WEB2, out_dir=out[2], num_shards=SHARDS,
                    max_epochs=EPOCHS, etag_manifest_dir=out[1],
                    collect_parity_outputs=True),
        seed_urls(WEB2),
    )

    o0 = oracle_crawl(WEB0, seed_urls(WEB0), max_epochs=EPOCHS,
                      num_shards=SHARDS)
    o1 = oracle_crawl(WEB1, seed_urls(WEB1), max_epochs=EPOCHS,
                      num_shards=SHARDS, etag_manifest=_oracle_manifest(o0))
    # the union manifest, newest generation winning shared digests
    man2 = {**_oracle_manifest(o0), **_oracle_manifest(o1)}
    o2 = oracle_crawl(WEB2, seed_urls(WEB2), max_epochs=EPOCHS,
                      num_shards=SHARDS, etag_manifest=man2)
    assert sorted(stats2.fetch_log, key=_key) == sorted(o2.fetch_log,
                                                        key=_key)
    nm2 = sum(m["not_modified"] for m in stats2.metrics)
    assert nm2 > 0  # stable pages 304 again in gen2

    def _etags(df):
        return {
            i: content_etag(w, h, f, p, c)
            for i, w, h, f, p, c in zip(df["image_id"], df["w"], df["h"],
                                        df["fmt"], df["phash"],
                                        df["caption"])
        }

    e0 = _etags(read_payload(out[0]).to_pandas())
    e1 = _etags(read_payload(out[1]).to_pandas())
    e2 = _etags(read_payload(out[2]).to_pandas())
    # never re-store unchanged — across EVERY generation pair in the chain
    for ea, eb in ((e0, e1), (e1, e2), (e0, e2)):
        assert sum(1 for i in set(ea) & set(eb) if ea[i] == eb[i]) == 0
