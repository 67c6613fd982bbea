"""Checkpoint/resume: kill the crawl after a checkpoint epoch, resume from
the Lance-style checkpoint (parquet fallback), and verify the final payload
and seen-set are identical to an uninterrupted run (reference analog:
``Stance_Detection.py:235-263`` resume loader + per-iteration JSONs)."""

import pandas as pd
import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls

WEB = WebConfig(n_hosts=5, pages_per_host=16)
SHARDS = 3


def _run(ray_session, out, max_epochs, saving_period=3, resume=False):
    from raycrawl.crawler import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=max_epochs,
        saving_period=saving_period, collect_parity_outputs=True,
    )
    return run_crawl(cfg, seed_urls(WEB), resume=resume)


def _payload_df(out):
    from raycrawl.crawler import read_payload

    df = read_payload(out).to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


@pytest.mark.parametrize("interrupt_epoch", [4])
def test_resume_matches_uninterrupted(ray_session, tmp_path, interrupt_epoch):
    full_out = str(tmp_path / "full")
    part_out = str(tmp_path / "part")

    full = _run(ray_session, full_out, max_epochs=50)

    # interrupted run: stops after `interrupt_epoch` epochs; simulate a hard
    # kill mid-epoch by discarding the final (graceful) checkpoint so only
    # the periodic one at epoch 2 remains — resume must discard the payload
    # of the partially-complete epochs after it and redo them
    import shutil, os

    _run(ray_session, part_out, max_epochs=interrupt_epoch)
    from raycrawl.crawler import latest_checkpoint_epoch

    last = latest_checkpoint_epoch(part_out)
    assert last == interrupt_epoch - 1
    shutil.rmtree(os.path.join(part_out, "checkpoints", f"epoch={last}"))
    assert latest_checkpoint_epoch(part_out) == 2  # periodic, saving_period=3

    resumed = _run(ray_session, part_out, max_epochs=50, resume=True)

    assert resumed.epochs == full.epochs
    a, b = _payload_df(full_out), _payload_df(part_out)
    pd.testing.assert_frame_equal(
        a[["image_id", "caption", "phash", "w", "h", "fmt", "url"]],
        b[["image_id", "caption", "phash", "w", "h", "fmt", "url"]],
    )
    assert {s: sorted(v) for s, v in full.seen.items()} == {
        s: sorted(v) for s, v in resumed.seen.items()
    }
    # lineage metrics agree too (cumulative counters survive the restore)
    for s in range(SHARDS):
        for k in ("fetched", "robots_denied", "phash_suppressed"):
            assert full.metrics[s][k] == resumed.metrics[s][k]


def test_graceful_stop_then_resume(ray_session, tmp_path):
    """should_stop (SIGTERM analog) checkpoints mid-crawl; resuming yields
    the same final output as an uninterrupted run."""
    from raycrawl.crawler import CrawlConfig, run_crawl

    out_full = str(tmp_path / "full")
    out_stop = str(tmp_path / "stop")
    full = _run(ray_session, out_full, max_epochs=50)

    calls = {"n": 0}

    def stop_after_3():
        calls["n"] += 1
        return calls["n"] > 3

    cfg = CrawlConfig(
        web=WEB, out_dir=out_stop, num_shards=SHARDS, max_epochs=50,
        saving_period=3, collect_parity_outputs=True,
    )
    from raycrawl.core.webgraph import seed_urls

    run_crawl(cfg, seed_urls(WEB), should_stop=stop_after_3)
    resumed = _run(ray_session, out_stop, max_epochs=50, resume=True)
    assert resumed.epochs == full.epochs
    import pandas as pd

    a, b = _payload_df(out_full), _payload_df(out_stop)
    pd.testing.assert_frame_equal(
        a[["image_id", "caption", "phash"]], b[["image_id", "caption", "phash"]]
    )


def test_resume_after_max_epochs_cut_carries_flushed_seen(ray_session, tmp_path):
    """A crawl cut by max_epochs on an unbounded trap web flushes its
    pending offers into seen before the closing checkpoint (round-4
    falsifier). Resuming FROM that final checkpoint must (a) restore the
    flushed seen exactly — oracle parity at the cut point — and (b)
    continue to the same final state as an uninterrupted longer run."""
    from raycrawl.crawler import CrawlConfig, run_crawl
    from raycrawl.oracle import oracle_crawl

    web = WebConfig(n_hosts=2, pages_per_host=6, seed=0, neardup_every=1,
                    trap_links=True)
    seeds = seed_urls(web)

    def cfg_for(out, max_epochs):
        return CrawlConfig(
            web=web, out_dir=out, num_shards=2, max_epochs=max_epochs,
            saving_period=3, collect_parity_outputs=True,
        )

    cut = run_crawl(cfg_for(str(tmp_path / "c"), 5), seeds)
    want_cut = oracle_crawl(web, seeds, max_epochs=5, num_shards=2)
    assert {s: sorted(v) for s, v in want_cut.seen.items()} == {
        s: sorted(v) for s, v in cut.seen.items()
    }

    resumed = run_crawl(cfg_for(str(tmp_path / "c"), 12), seeds, resume=True)
    full = run_crawl(cfg_for(str(tmp_path / "f"), 12), seeds)
    want_full = oracle_crawl(web, seeds, max_epochs=12, num_shards=2)
    assert {s: sorted(v) for s, v in want_full.seen.items()} == {
        s: sorted(v) for s, v in resumed.seen.items()
    }
    a, b = _payload_df(str(tmp_path / "f")), _payload_df(str(tmp_path / "c"))
    pd.testing.assert_frame_equal(
        a[["image_id", "caption", "phash"]], b[["image_id", "caption", "phash"]]
    )
    assert full.epochs == resumed.epochs


def test_resume_with_global_phash_tier(ray_session, tmp_path):
    """Kill/resume with the global dedup tier: the dedup shards' committed
    indexes restore from their checkpoints and the final output matches an
    uninterrupted run."""
    from raycrawl.core.webgraph import WebConfig, seed_urls
    from raycrawl.crawler import CrawlConfig, run_crawl

    web = WebConfig(n_hosts=5, pages_per_host=10, cross_host_dup=True)

    def cfg_for(out, max_epochs):
        return CrawlConfig(
            web=web, out_dir=out, num_shards=2, max_epochs=max_epochs,
            saving_period=3, global_phash_dedup=True, num_phash_shards=3,
            collect_parity_outputs=True,
        )

    full = run_crawl(cfg_for(str(tmp_path / "f"), 50), seed_urls(web))
    run_crawl(cfg_for(str(tmp_path / "p"), 4), seed_urls(web))
    import os
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path / "p"), "checkpoints", "epoch=3"))
    resumed = run_crawl(cfg_for(str(tmp_path / "p"), 50), seed_urls(web), resume=True)
    assert resumed.epochs == full.epochs
    assert {s: sorted(v) for s, v in full.seen.items()} == {
        s: sorted(v) for s, v in resumed.seen.items()
    }
    for s in range(2):
        for k in ("fetched", "phash_suppressed", "fetch_errors"):
            assert full.metrics[s][k] == resumed.metrics[s][k]
