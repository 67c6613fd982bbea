"""301 redirect-chain following: alias pages (`/r/J`) cost a politeness
token, produce no payload, and their target enters the frontier through
the normal enqueue path at the SAME depth. The engine must match the
sequential oracle exactly (ordering, seen sets, payload, metrics), the
redirect pops must land in their own sidecar tree so the checkpoint-merge
digest-union quota rebuild stays exact, and redirect_every=0 universes
must stay byte-identical to the pre-feature web."""

import os

import pyarrow.parquet as pq
import pytest

from raycrawl.core.webgraph import WebConfig, page_for, seed_urls
from raycrawl.oracle import oracle_crawl

WEB = WebConfig(n_hosts=6, pages_per_host=20, redirect_every=3)
SHARDS = 4
EPOCHS = 40


def _key(r):
    return (r["epoch"], -r["priority"], r["depth"], r["discovered_at"],
            r["url_hash"])


@pytest.fixture(scope="module")
def oracle():
    return oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS)


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    out = str(tmp_path_factory.mktemp("redir") / "out")
    cfg = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                      max_epochs=EPOCHS, collect_parity_outputs=True)
    stats = run_crawl(cfg, seed_urls(WEB))
    payload = read_payload(out).to_pandas()
    return stats, payload, out


def test_alias_page_shape():
    p = page_for(WEB, "http://h0.web.test/r/7")
    assert p.redirect_to == "http://h0.web.test/p/7"
    assert p.data is None and p.outlinks == [] and p.caption is None


def test_redirects_actually_fire(oracle):
    assert sum(m["redirects_followed"] for m in oracle.metrics.values()) > 0


def test_redirect_parity_ordering(oracle, engine):
    stats, _, _ = engine
    assert sorted(oracle.fetch_log, key=_key) == sorted(stats.fetch_log,
                                                        key=_key)


def test_redirect_parity_seen_and_metrics(oracle, engine):
    stats, _, _ = engine
    assert {s: sorted(v) for s, v in oracle.seen.items()} == {
        s: sorted(v) for s, v in stats.seen.items()
    }
    for s in range(SHARDS):
        eng = {k: stats.metrics[s][k] for k in oracle.metrics[s]}
        assert eng == oracle.metrics[s], f"shard {s}"


def test_redirect_parity_payload_and_no_alias_rows(oracle, engine):
    _, payload, _ = engine
    got = {r.image_id: (r.caption, int(r.phash)) for r in payload.itertuples()}
    want = {p["image_id"]: (p["caption"], p["phash"]) for p in oracle.payload}
    assert got == want
    assert not payload["url"].str.contains("/r/").any()


def test_redirect_target_same_depth_gate_unit(ray_session):
    """The gate offers a redirect target at the ALIAS's depth, not
    depth+1: submit one synthetic redirect row and one plain-outlink row
    at depth 5 and read back the offered depths."""
    import ray

    from raycrawl.core.urltools import host_of, url_sha1
    from raycrawl.frontier.shard import FrontierShard

    actor = ray.remote(num_cpus=0)(FrontierShard).remote(0)
    rd_url = "http://h1.web.test/p/9"
    rd = (rd_url, url_sha1(rd_url), host_of(rd_url), 3)
    link_url = "http://h3.web.test/p/4"
    link = (link_url, url_sha1(link_url), host_of(link_url), 2)
    ray.get(
        actor.gate_submit.remote(
            0,
            [url_sha1("http://h0.web.test/r/9"),
             url_sha1("http://h2.web.test/p/1")],
            [None, 123456],
            [("http://h0.web.test/r/9", "h0.web.test", 1, 5, 0, rd),
             ("http://h2.web.test/p/1", "h2.web.test", 1, 5, 0, None)],
            [[], [link]],
        )
    )
    kept, sup, errs, redirs, _nm, offers = ray.get(
        actor.gate_finalize.remote(0, 2)
    )
    assert len(redirs) == 1 and kept == 1 and not sup and not errs
    offered = {}
    for ref in offers.values():
        urls, _dg, _h, _pri, depths = ray.get(ref)
        offered.update(dict(zip(urls, depths)))
    assert offered[rd_url] == 5      # redirect: SAME depth
    assert offered[link_url] == 6    # plain outlink: depth + 1
    ray.kill(actor)


def test_redirect_target_same_depth_witness(oracle):
    """At least one redirect target entered the frontier at the alias's
    own depth in the epoch right after the redirect was followed."""
    by_url = {}
    for r in oracle.fetch_log:
        by_url.setdefault(r["url"], r)
    witnesses = 0
    for r in oracle.fetch_log:
        if r["status"] != "redirected":
            continue
        t = by_url.get(r["url"].replace("/r/", "/p/"))
        if (t is not None and t["depth"] == r["depth"]
                and t["discovered_at"] == r["epoch"] + 1):
            witnesses += 1
    assert witnesses > 0


def test_redirect_sidecar_is_exact_pop_partition(engine):
    """payload ∪ suppressed ∪ errors ∪ redirects, deduped by digest, must
    equal the popped set exactly (the merge tool's quota-rebuild
    invariant), with redirect pops appearing ONLY in the redirects tree."""
    from raycrawl.frontier.merge import _popped_digest_hosts

    stats, payload, out = engine
    popped = _popped_digest_hosts(out, stats.epochs - 1)
    assert popped is not None
    pop_statuses = {"fetched", "dup_suppressed", "fetch_error", "redirected"}
    want = {r["url_hash"] for r in stats.fetch_log
            if r["status"] in pop_statuses}
    assert {d.hex() for d in popped} == want
    redir_digests = set()
    for f in sorted(os.listdir(os.path.join(out, "redirects"))):
        t = pq.read_table(os.path.join(out, "redirects", f))
        redir_digests.update(d.hex() for d in t["url_hash"].to_pylist())
    log_redirs = {r["url_hash"] for r in stats.fetch_log
                  if r["status"] == "redirected"}
    assert redir_digests == log_redirs and log_redirs


def test_redirect_global_dedup_parity(ray_session, tmp_path):
    """Redirects compose with the global phash tier: alias rows are never
    judged (no pixels) and parity holds end to end."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=5, pages_per_host=12, redirect_every=3,
                    cross_host_dup=True)
    o = oracle_crawl(web, seed_urls(web), max_epochs=25, num_shards=SHARDS,
                     global_phash_dedup=True)
    cfg = CrawlConfig(web=web, out_dir=str(tmp_path / "g"),
                      num_shards=SHARDS, max_epochs=25,
                      collect_parity_outputs=True, global_phash_dedup=True)
    s = run_crawl(cfg, seed_urls(web))
    assert sorted(o.fetch_log, key=_key) == sorted(s.fetch_log, key=_key)
    assert sum(m["redirects_followed"] for m in o.metrics.values()) > 0


def test_redirect_off_is_byte_identical():
    """redirect_every=0 (the default) must not perturb the web universe:
    outlinks and payloads of the pre-feature config are unchanged."""
    base = WebConfig(n_hosts=3, pages_per_host=10)
    for i in range(10):
        p = page_for(base, f"http://h1.web.test/p/{i}")
        assert p.redirect_to is None
        assert not any("/r/" in l for l in p.outlinks)


def test_redirect_resume(ray_session, tmp_path):
    """A redirect-heavy crawl stopped mid-way and resumed must converge to
    the same seen set as an uninterrupted crawl."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    out_full = str(tmp_path / "full")
    cfg_full = CrawlConfig(web=WEB, out_dir=out_full, num_shards=SHARDS,
                           max_epochs=EPOCHS, collect_parity_outputs=True)
    full = run_crawl(cfg_full, seed_urls(WEB))

    out = str(tmp_path / "resumed")
    cfg1 = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                       max_epochs=4, saving_period=2,
                       collect_parity_outputs=True)
    run_crawl(cfg1, seed_urls(WEB))
    cfg2 = CrawlConfig(web=WEB, out_dir=out, num_shards=SHARDS,
                       max_epochs=EPOCHS, collect_parity_outputs=True)
    resumed = run_crawl(cfg2, seed_urls(WEB), resume=True)
    assert {s: sorted(v) for s, v in resumed.seen.items()} == {
        s: sorted(v) for s, v in full.seen.items()
    }


def test_crawl_redirect_audit_reconciles(ray_session):
    """Registry audit: metric total == sidecar rows, and no alias URL ever
    reaches the payload."""
    from raycrawl.ops import REGISTRY

    t = REGISTRY["crawl_redirect_audit"]["fn"]("/root/testdata/sf0.001")
    row = t.to_pandas().iloc[0]
    assert row["redirects_followed"] == row["redirect_sidecar_rows"] > 0
    assert row["alias_payload_rows"] == 0
    assert row["hosts_with_redirects"] > 0
