"""Error-backoff adaptive politeness (CrawlConfig.error_backoff): a host's
effective token rate halves per consecutive fetch error (cap /64) and
restores on the next success. Engine↔oracle ordering/seen/metrics parity
with the feature ON, schedule actually changes vs OFF, streaks persist
through checkpoint/resume, and the flag stays inert when unset."""

import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

# enough hosts/pages that fetch_fails (deterministic per digest) produces
# multi-error streaks on some hosts
WEB = WebConfig(n_hosts=8, pages_per_host=24)
SHARDS = 3
EPOCHS = 50


def _sort_log(log):
    return sorted(
        log,
        key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                       r["discovered_at"], r["url_hash"]),
    )


@pytest.fixture(scope="module")
def oracle_on():
    return oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS, error_backoff=True)


@pytest.fixture(scope="module")
def engine_on(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("backoff") / "out")
    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=EPOCHS,
        error_backoff=True, collect_parity_outputs=True,
    )
    return run_crawl(cfg, seed_urls(WEB))


def test_backoff_ordering_parity(oracle_on, engine_on):
    assert _sort_log(oracle_on.fetch_log) == _sort_log(engine_on.fetch_log)


def test_backoff_seen_parity(oracle_on, engine_on):
    assert {s: sorted(v) for s, v in oracle_on.seen.items()} == {
        s: sorted(v) for s, v in engine_on.seen.items()
    }


def test_backoff_metrics_parity(oracle_on, engine_on):
    for s in range(SHARDS):
        eng = {k: engine_on.metrics[s][k] for k in oracle_on.metrics[s]}
        assert eng == oracle_on.metrics[s], f"shard {s}"


def test_backoff_changes_schedule(oracle_on):
    """The feature must be observable: with errors present, backing off
    reshapes WHEN flaky hosts' URLs are served."""
    base = oracle_crawl(WEB, seed_urls(WEB), max_epochs=EPOCHS,
                        num_shards=SHARDS, error_backoff=False)
    assert sum(m["fetch_errors"] for m in base.metrics.values()) > 0
    when_on = {r["url_hash"]: r["epoch"] for r in oracle_on.fetch_log
               if r["status"] == "fetched"}
    when_off = {r["url_hash"]: r["epoch"] for r in base.fetch_log
                if r["status"] == "fetched"}
    assert when_on != when_off
    # coverage is eventually identical — backoff delays, never drops
    assert set(when_on) == set(when_off)


def test_backoff_off_is_inert(ray_session, tmp_path):
    """error_backoff=False must be byte-identical to the pre-feature
    oracle (dynamic refill re-evaluation alone changes nothing)."""
    a = oracle_crawl(WEB, seed_urls(WEB), max_epochs=12, num_shards=SHARDS)
    from raycrawl.crawler import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        web=WEB, out_dir=str(tmp_path / "inert"), num_shards=SHARDS,
        max_epochs=12, collect_parity_outputs=True,
    )
    stats = run_crawl(cfg, seed_urls(WEB))
    assert _sort_log(a.fetch_log) == _sort_log(stats.fetch_log)


def test_backoff_streaks_survive_resume(ray_session, tmp_path, oracle_on):
    """Kill after an early checkpoint and resume with the flag on: final
    log equals the uninterrupted oracle — the consec-error streaks (and
    the damped token rates they imply) persisted, not just the flag."""
    from raycrawl.crawler import CrawlConfig, latest_checkpoint_epoch, run_crawl

    out = str(tmp_path / "resume")
    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=6,
        saving_period=3, error_backoff=True, collect_parity_outputs=True,
    )
    run_crawl(cfg, seed_urls(WEB))
    assert latest_checkpoint_epoch(out) is not None
    cfg2 = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=EPOCHS,
        error_backoff=True, collect_parity_outputs=True,
    )
    stats = run_crawl(cfg2, seed_urls(WEB), resume=True)
    assert _sort_log(oracle_on.fetch_log) == _sort_log(stats.fetch_log)


def test_crawl_backoff_audit_query(ray_session):
    """Three independent error records must reconcile: dead-letter
    sidecar rows == shard fetch_errors counters; final streaks bounded
    by the error total; the audited universe actually errored."""
    from raycrawl.ops import REGISTRY

    t = REGISTRY["crawl_backoff_audit"]["fn"]("/root/testdata/sf0.001")
    r = (t.to_pandas() if hasattr(t, "to_pandas") else t).iloc[0]
    assert r["fetch_errors"] > 0
    assert r["error_sidecar_rows"] == r["fetch_errors"]
    assert r["max_final_streak"] <= r["fetch_errors"]
    assert r["n_hosts_final_streak"] <= 16
