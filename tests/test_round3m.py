"""Session-8: lifetime per-host page quota (CrawlConfig.max_pages_per_host
— the production-crawler "crawl budget" knob). Engine↔oracle parity under
a quota, hard cap enforcement, metric accounting identities, and
checkpoint/resume persistence of the per-host counters."""

import pandas as pd
import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

WEB = WebConfig(n_hosts=6, pages_per_host=20)
SHARDS = 3
EPOCHS = 40
QUOTA = 7


@pytest.fixture(scope="module")
def oracle():
    return oracle_crawl(
        WEB, seed_urls(WEB), max_epochs=EPOCHS, num_shards=SHARDS,
        max_pages_per_host=QUOTA,
    )


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, read_payload, run_crawl

    out = str(tmp_path_factory.mktemp("quota") / "out")
    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=EPOCHS,
        max_pages_per_host=QUOTA, collect_parity_outputs=True,
    )
    stats = run_crawl(cfg, seed_urls(WEB))
    payload = read_payload(out).to_pandas()
    return stats, payload


def _sort_log(log):
    return sorted(
        log,
        key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                       r["discovered_at"], r["url_hash"]),
    )


def test_quota_ordering_parity(oracle, engine):
    stats, _ = engine
    assert _sort_log(oracle.fetch_log) == _sort_log(stats.fetch_log)


def test_quota_seen_parity(oracle, engine):
    stats, _ = engine
    assert {s: sorted(v) for s, v in oracle.seen.items()} == {
        s: sorted(v) for s, v in stats.seen.items()
    }


def test_quota_metrics_parity(oracle, engine):
    stats, _ = engine
    for s in range(SHARDS):
        eng = {k: stats.metrics[s][k] for k in oracle.metrics[s]}
        assert eng == oracle.metrics[s], f"shard {s}"
    # the quota actually fired somewhere
    total_denied = sum(m["quota_denied"] for m in stats.metrics)
    total_dropped = sum(m["quota_dropped"] for m in stats.metrics)
    assert total_denied + total_dropped > 0


def test_quota_hard_cap_on_payload(oracle, engine):
    """No host may ever exceed QUOTA fetch slots: payload rows (plus
    suppressed/error slots) per host ≤ QUOTA."""
    stats, payload = engine
    per_host = pd.Series(
        [u.split("://", 1)[1].split("/", 1)[0] for u in payload["url"]]
    ).value_counts()
    assert (per_host <= QUOTA).all()
    # exact slot accounting from the fetch log: every fetched/suppressed/
    # errored row spent one slot
    log = pd.DataFrame(stats.fetch_log)
    spent = log[log["status"].isin(["fetched", "phash_suppressed",
                                    "fetch_error"])]
    slots = spent.groupby("host").size()
    assert (slots <= QUOTA).all()


def test_quota_identities(oracle, engine):
    """seen_count == accepted + robots_denied + trap_denied + quota_denied,
    and accepted == resolved + quota_dropped on a drained crawl."""
    stats, _ = engine
    for m in stats.metrics:
        assert m["seen_count"] == (
            m["accepted"] + m["robots_denied"] + m["trap_denied"]
            + m["quota_denied"]
        )
        resolved = m["fetched"] + m["phash_suppressed"] + m["fetch_errors"]
        assert m["accepted"] == resolved + m["quota_dropped"]


def test_quota_survives_resume(ray_session, tmp_path):
    """Kill after the first checkpoint, resume: the resumed crawl must not
    re-serve capped hosts, and the final fetch log must equal the oracle's
    (counter persistence, not just config)."""
    from raycrawl.crawler import CrawlConfig, latest_checkpoint_epoch, run_crawl

    out = str(tmp_path / "crawl")
    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=6,
        saving_period=3, max_pages_per_host=QUOTA,
        collect_parity_outputs=True,
    )
    run_crawl(cfg, seed_urls(WEB))
    assert latest_checkpoint_epoch(out) is not None

    cfg2 = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=EPOCHS,
        max_pages_per_host=QUOTA, collect_parity_outputs=True,
    )
    stats = run_crawl(cfg2, seed_urls(WEB), resume=True)
    want = oracle_crawl(
        WEB, seed_urls(WEB), max_epochs=EPOCHS, num_shards=SHARDS,
        max_pages_per_host=QUOTA,
    )
    assert _sort_log(want.fetch_log) == _sort_log(stats.fetch_log)


def test_quota_none_is_unchanged(ray_session):
    """Quota off must be byte-identical to the pre-quota oracle (the new
    code path is inert when unset)."""
    a = oracle_crawl(WEB, seed_urls(WEB), max_epochs=10, num_shards=SHARDS)
    b = oracle_crawl(
        WEB, seed_urls(WEB), max_epochs=10, num_shards=SHARDS,
        max_pages_per_host=None,
    )
    assert _sort_log(a.fetch_log) == _sort_log(b.fetch_log)


def test_quota_counters_survive_merge_and_reshard(ray_session, tmp_path):
    """Merging two capped crawls must carry per-host slot counters as the
    DIGEST-UNION of both crawls' pops (what one union-seed crawl would
    have spent — disjoint seeds can still reach the same URLs through
    links, and those slots must not double-count), and resharding must
    route each host's counter to its new home shard — a capped host
    stays capped through both."""
    import json
    import os

    from raycrawl.core.urltools import shard_of_host
    from raycrawl.crawler import CrawlConfig, run_crawl
    from raycrawl.frontier.merge import merge_checkpoints, reshard_checkpoint

    seeds = seed_urls(WEB)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")

    def run(out, s):
        cfg = CrawlConfig(
            web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=4,
            saving_period=2, max_pages_per_host=QUOTA,
            collect_parity_outputs=True,
        )
        return run_crawl(cfg, s)

    stats_a = run(out_a, seeds[:3])
    stats_b = run(out_b, seeds[3:])

    def host_popped_of(out_dir, epoch, n):
        hp: dict[str, int] = {}
        quotas = []
        base = os.path.join(out_dir, "checkpoints", f"epoch={epoch}")
        for sid in range(n):
            with open(os.path.join(base, f"shard={sid}", "manifest.json")) as f:
                m = json.load(f)
            for h, c in m.get("host_popped", {}).items():
                hp[h] = hp.get(h, 0) + c
            quotas.append(m.get("host_quota"))
        return hp, quotas

    from raycrawl.crawler import latest_checkpoint_epoch

    ea, eb = latest_checkpoint_epoch(out_a), latest_checkpoint_epoch(out_b)
    hp_a, _ = host_popped_of(out_a, ea, SHARDS)
    hp_b, _ = host_popped_of(out_b, eb, SHARDS)
    assert hp_a and hp_b

    out_m = str(tmp_path / "m")
    merge_checkpoints(out_a, out_b, out_m)
    hp_m, quotas_m = host_popped_of(out_m, 0, SHARDS)

    def popped(stats):
        out: dict[str, set] = {}
        for row in stats.fetch_log:
            if row["status"] in ("fetched", "fetch_error", "dup_suppressed"):
                out.setdefault(row["host"], set()).add(row["url_hash"])
        return out

    pa_, pb_ = popped(stats_a), popped(stats_b)
    want = {
        h: len(pa_.get(h, set()) | pb_.get(h, set()))
        for h in set(pa_) | set(pb_)
    }
    assert hp_m == want
    assert all(q == QUOTA for q in quotas_m)

    out_r = str(tmp_path / "r")
    new_n = SHARDS + 2
    reshard_checkpoint(out_m, out_r, new_n)
    hp_r, quotas_r = host_popped_of(out_r, 0, new_n)
    assert hp_r == want
    assert all(q == QUOTA for q in quotas_r)
    # each counter lives on its host's new home shard
    base = os.path.join(out_r, "checkpoints", "epoch=0")
    for sid in range(new_n):
        with open(os.path.join(base, f"shard={sid}", "manifest.json")) as f:
            m = json.load(f)
        for h in m.get("host_popped", {}):
            assert shard_of_host(h, new_n) == sid
