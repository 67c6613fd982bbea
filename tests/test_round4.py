"""Round-4 hardening: bounded actor-resident crawl state.

VERDICT r3 #1: ``FrontierShard.log`` grew one dict per crawled URL forever
(flush advanced a cursor but kept the list; resume reloaded the whole
history) and the ``_gate_memo`` / ``_offer_memo`` idempotency memos grew one
entry per epoch — O(crawl-size) actor heap at 10^10 URLs. The fix: every
checkpoint flushes the log tail to the ``fetch_log_increment`` sidecar and
TRUNCATES it; memos evict entries older than the replay horizon. These
tests pin the boundedness AND that full-history parity (including resume)
still holds by paging from the checkpoint tree."""

import os

import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.frontier.shard import FrontierShard
from raycrawl.oracle import oracle_crawl


def _offer(s, epoch, urls, offer_key=None):
    from raycrawl.core.urltools import canonicalize_url, url_sha1, host_of
    from raycrawl.core.webgraph import priority_of

    cus = [canonicalize_url(u) for u in urls]
    digests = [url_sha1(u) for u in cus]
    hosts = [host_of(u) for u in cus]
    s.offer(
        offer_key if offer_key is not None else (epoch, 0),
        cus, digests, hosts,
        [priority_of(d) for d in digests],
        [0] * len(cus),
        epoch,
    )


def _run_epoch(s, epoch):
    """offer → pop → submit-all-as-fetched → finalize, one epoch."""
    _offer(s, epoch, [f"http://h1.web.test/p/{epoch * 8 + i}"
                      for i in range(8)])
    s.pop(epoch)
    t = s.take_popped()
    s.gate_submit(
        epoch,
        t["url_hash"].to_pylist(),
        [(0x1 << (j % 60)) | (epoch << 1) for j in range(t.num_rows)],
        [
            (u, h, p, d, da)
            for u, h, p, d, da in zip(
                t["url"].to_pylist(), t["host"].to_pylist(),
                t["priority"].to_pylist(), t["depth"].to_pylist(),
                t["discovered_at"].to_pylist(),
            )
        ],
        [[] for _ in range(t.num_rows)],
    )
    s.gate_finalize(epoch, num_shards=2)


def test_fetch_log_truncated_at_every_checkpoint(tmp_path):
    """A long crawl's in-memory log must stay bounded by one saving_period
    of rows while the checkpoint tree accumulates the FULL history."""
    s = FrontierShard(0, epoch_seconds=8.0, burst=16.0)
    ck = str(tmp_path / "ckpt")
    total_logged = 0
    peak_tail = 0
    for epoch in range(12):
        _run_epoch(s, epoch)
        peak_tail = max(peak_tail, len(s.log))
        if (epoch + 1) % 3 == 0:
            s.checkpoint(ck, epoch)
            assert s.log == []  # truncated, not just cursor-advanced
            total_logged = s._log_flushed
    # every epoch popped/logged something; the tail never held more than
    # 3 epochs of rows while the flushed total kept growing
    assert total_logged > 0
    assert peak_tail <= 3 * 16  # 3 epochs x (pop budget ≈ burst rows)
    # the checkpoint tree holds the complete history, in order
    import pyarrow.parquet as pq

    rows = []
    for ed in sorted(os.listdir(ck), key=lambda x: int(x.split("=")[1])):
        lp = os.path.join(ck, ed, "shard=0", "fetch_log_increment.parquet")
        if os.path.exists(lp):
            rows.extend(pq.read_table(lp).to_pylist())
    assert len(rows) == total_logged
    statuses = {r["status"] for r in rows}
    assert "fetched" in statuses


def test_same_epoch_double_checkpoint_merges_increment(tmp_path):
    """The final checkpoint can label the SAME epoch as the last periodic
    one; rows logged in between must merge into the increment, never
    overwrite it."""
    import pyarrow.parquet as pq

    s = FrontierShard(0, epoch_seconds=8.0, burst=16.0)
    ck = str(tmp_path / "ckpt")
    _run_epoch(s, 0)
    s.checkpoint(ck, 0)
    n_first = s._log_flushed
    assert n_first > 0
    # more activity logged before a second checkpoint at the same label
    # (e.g. pending-merge denials observed during the exit pop)
    _run_epoch(s, 1)
    n_second = len(s.log)
    assert n_second > 0
    s.checkpoint(ck, 0)
    lp = os.path.join(ck, "epoch=0", "shard=0", "fetch_log_increment.parquet")
    assert pq.read_metadata(lp).num_rows == n_first + n_second


def test_memos_evicted_beyond_replay_horizon(tmp_path):
    s = FrontierShard(0, epoch_seconds=8.0, burst=16.0)
    for epoch in range(10):
        _run_epoch(s, epoch)
        sizes = s.resident_state_sizes()
        assert sizes["gate_memo"] <= FrontierShard.REPLAY_HORIZON + 1
        assert sizes["offer_memo"] <= FrontierShard.REPLAY_HORIZON + 1
        assert sizes["gate_buf"] <= FrontierShard.REPLAY_HORIZON + 1
    # replay safety INSIDE the horizon is untouched: re-finalizing the
    # current epoch returns the memoized result without double-mutation
    fetched_before = s.metrics["fetched"]
    again = s.gate_finalize(9, num_shards=2)
    assert s.metrics["fetched"] == fetched_before
    assert again[0] >= 0  # memoized tuple, same shape


def test_restore_starts_with_empty_tail(tmp_path):
    s = FrontierShard(0, epoch_seconds=8.0, burst=16.0)
    _run_epoch(s, 0)
    ck = str(tmp_path / "ckpt")
    s.checkpoint(ck, 0)
    r = FrontierShard.restore(ck, 0, 0)
    assert r.get_log() == []
    assert r._log_flushed == 0
    # metrics/seen survived even though the log tail did not
    assert r.metrics == s.metrics
    assert r.get_seen() == s.get_seen()


def test_long_crawl_parity_with_truncated_logs(ray_session, tmp_path):
    """Full-crawl ordering parity vs the sequential oracle with a SHORT
    saving_period (many truncation cycles) and a mid-run stop/resume:
    collect_fetch_log must page the complete history from the checkpoint
    tree across both sessions."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=5, pages_per_host=14)
    oracle = oracle_crawl(web, seed_urls(web), max_epochs=30, num_shards=3)

    def _sort(log):
        return sorted(
            log, key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                                r["discovered_at"], r["url_hash"]),
        )

    out = str(tmp_path / "out")

    def cfg(max_epochs):
        return CrawlConfig(web=web, out_dir=out, num_shards=3,
                           max_epochs=max_epochs, saving_period=2,
                           collect_parity_outputs=True)

    run_crawl(cfg(5), seed_urls(web))
    stats = run_crawl(cfg(30), seed_urls(web), resume=True)
    assert _sort(oracle.fetch_log) == _sort(stats.fetch_log)
    assert {s: sorted(v) for s, v in oracle.seen.items()} == {
        s: sorted(v) for s, v in stats.seen.items()
    }


# ---------------------------------------------------- per-path robots rules


def test_robots_match_semantics():
    from raycrawl.core.politeness import robots_match

    assert robots_match("/private", "/private/p/3")
    assert robots_match("/private", "/private")
    assert not robots_match("/private", "/p/3")
    # wildcard spans any run of characters
    assert robots_match("/p/*7$", "/p/7")
    assert robots_match("/p/*7$", "/p/17")
    assert robots_match("/p/*7$", "/p/107")
    # $ anchors the end
    assert not robots_match("/p/*7$", "/p/171")
    assert not robots_match("/p/*7$", "/private/p/17")
    # un-anchored wildcard
    assert robots_match("/a*z", "/abcz-tail")


def test_robots_longest_match_allow_override():
    from raycrawl.core.politeness import RobotsCache

    rc = RobotsCache(rich=True)
    # h0.web.test: Disallow /private + Allow /private/p/2$ (byte5 even)
    assert not rc.allowed("h0.web.test", "/private/p/1")
    assert rc.allowed("h0.web.test", "/private/p/2")   # longer Allow wins
    assert not rc.allowed("h0.web.test", "/private/p/21")  # $ anchor
    assert rc.allowed("h0.web.test", "/p/2")
    # h8.web.test: Disallow /private AND /p/*7$
    assert not rc.allowed("h8.web.test", "/p/7")
    assert not rc.allowed("h8.web.test", "/p/17")
    assert rc.allowed("h8.web.test", "/p/171")
    assert not rc.allowed("h8.web.test", "/private/p/2")  # no override here
    # rich=False keeps the legacy behavior exactly
    rc0 = RobotsCache()
    assert rc0.allowed("h8.web.test", "/p/17")
    assert not rc0.allowed("h8.web.test", "/private/p/2")


def test_rich_robots_crawl_parity(ray_session, tmp_path):
    """Engine vs oracle with per-path REP rules ON, including an explicit
    seed inside the Allow-override window; the wildcard Disallow and the
    Allow override must both fire in the shared log."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=16, pages_per_host=18)
    seeds = seed_urls(web) + ["http://h0.web.test/private/p/2"]
    oracle = oracle_crawl(web, seeds, max_epochs=25, num_shards=4,
                          rich_robots=True)
    out = str(tmp_path / "rr")
    cfg = CrawlConfig(web=web, out_dir=out, num_shards=4, max_epochs=25,
                      rich_robots=True, collect_parity_outputs=True)
    stats = run_crawl(cfg, seeds)

    def _sort(log):
        return sorted(
            log, key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                                r["discovered_at"], r["url_hash"]),
        )

    assert _sort(oracle.fetch_log) == _sort(stats.fetch_log)
    by_status = {}
    for r in stats.fetch_log:
        by_status.setdefault(r["status"], []).append(r["url"])
    # the wildcard Disallow denied some /p/..7 page on a p*7 host
    assert any(
        u.split("/")[-1].endswith("7") and "/private" not in u
        for u in by_status.get("robots_denied", ())
    )
    # the Allow override admitted the seeded /private/p/2 on h0
    assert "http://h0.web.test/private/p/2" in by_status.get("fetched", []) \
        or "http://h0.web.test/private/p/2" in by_status.get(
            "dup_suppressed", []) \
        or "http://h0.web.test/private/p/2" in by_status.get(
            "fetch_error", [])
    assert "http://h0.web.test/private/p/2" not in by_status.get(
        "robots_denied", ())


def test_rich_robots_checkpoint_roundtrip(tmp_path):
    """(allow, pattern) rules survive the JSON manifest round-trip and a
    restored shard keeps both the cached rules and the richness flag."""
    s = FrontierShard(0, rich_robots=True)
    assert not s.robots.allowed("h8.web.test", "/p/17")
    ck = str(tmp_path / "ck")
    s.checkpoint(ck, 0)
    r = FrontierShard.restore(ck, 0, 0)
    assert r.robots.rich is True
    assert r.robots.rules == s.robots.rules
    assert not r.robots.allowed("h8.web.test", "/p/27")


# ------------------------------------------------- sitemap seed expansion


def test_sitemap_seed_expansion_parity(ray_session, tmp_path):
    """A sitemap seed (http://hK/sitemap) expands to the host's full page
    manifest at fetch time: token spent, no payload row, entries offered at
    the sitemap's OWN depth (seed semantics). Exact oracle parity, and the
    sitemap pop rides the redirects sidecar so the popped-set partition
    invariant holds."""
    import pyarrow.parquet as pq

    from raycrawl.core.webgraph import sitemap_url
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    web = WebConfig(n_hosts=6, pages_per_host=14)
    # two sitemap seeds + one ordinary page seed
    seeds = [sitemap_url(0), sitemap_url(3), "http://h1.web.test/p/0"]
    oracle = oracle_crawl(web, seeds, max_epochs=30, num_shards=3)
    out = str(tmp_path / "sm")
    stats = run_crawl(
        CrawlConfig(web=web, out_dir=out, num_shards=3, max_epochs=30,
                    collect_parity_outputs=True),
        seeds,
    )

    def _sort(log):
        return sorted(
            log, key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                                r["discovered_at"], r["url_hash"]),
        )

    assert _sort(oracle.fetch_log) == _sort(stats.fetch_log)
    sm_rows = [r for r in stats.fetch_log if r["status"] == "sitemap"]
    assert sum(m["sitemap_expanded"] for m in stats.metrics) == len(sm_rows)
    assert len(sm_rows) >= 1  # at least one sitemap survived fetch_fails
    # every sitemap pop was recorded at depth 0 and its host's pages were
    # offered at depth 0 too (seed semantics, not depth+1)
    for r in sm_rows:
        host = r["host"]
        depth0_pages = [
            x for x in stats.fetch_log
            if x["host"] == host and x["depth"] == 0
            and "/p/" in x["url"] and "private" not in x["url"]
        ]
        assert depth0_pages, host
    # no payload row for the sitemap itself
    pay = read_payload(out).to_pandas()
    assert not pay["url"].str.endswith("/sitemap").any()
    # partition invariant: sitemap pops land in the redirects sidecar
    import glob

    redir_rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out, "redirects", "epoch=*.parquet"))
    )
    assert redir_rows == len(sm_rows)  # no 301s in this universe


def test_sitemap_seeds_file_cli(tmp_path):
    """--seeds-file accepts sitemap entries; the run expands them."""
    import json
    import subprocess
    import sys

    sf = tmp_path / "seeds.txt"
    sf.write_text("# seed manifest\nhttp://h0.web.test/sitemap\n"
                  "http://h2.web.test/p/0\n")
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "raycrawl", "crawl", "--out", out,
         "--hosts", "6", "--pages-per-host", "10", "--max-epochs", "20",
         "--seeds-file", str(sf), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert sum(m["sitemap_expanded"] for m in stats["metrics"]) == 1
    assert stats["payload_rows"] > 0
