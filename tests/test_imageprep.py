"""Oracles for the training-data image-prep operators (ops/imageprep.py):

* aspect buckets — the threshold-compare assignment must equal a
  brute-force nearest-in-log-space argmin,
* pixel stats — distributed sum/sumsq fold vs a direct per-image loop,
* shard assignment — hash determinism, balance, and a real partitioned
  write through the resumable hive sink,
* alignment gate — stub-score determinism and gate arithmetic.
"""

import math
import os

import numpy as np
import pyarrow as pa
import pytest

import ray

SF = "/root/testdata/sf0.001"

ASPECTS = [0.5, 2 / 3, 0.75, 1.0, 4 / 3, 1.5, 2.0]


def test_aspect_thresholds_equal_log_argmin():
    from raycrawl.ops.imageprep import _ASPECT_BOUNDS, _ASPECT_BUCKETS

    # every (w, h) the payload-dim construction can produce
    dims = [(w, h) for w in range(32, 65) for h in range(32, 65)]
    for w, h in dims:
        aspect = w / h
        by_thresh = _ASPECT_BUCKETS[int(np.digitize(aspect, _ASPECT_BOUNDS))]
        dists = [abs(math.log(aspect) - math.log(a)) for a in ASPECTS]
        by_argmin = _ASPECT_BUCKETS[int(np.argmin(dists))]
        assert by_thresh == by_argmin, (w, h)


def test_aspect_bucket_counts_cover_corpus():
    from raycrawl.ops.imageprep import image_aspect_bucket_routing

    t = image_aspect_bucket_routing(SF)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(t["n"].to_pylist()) == n_docs
    assert set(t["bucket"].to_pylist()) <= set("1:2 2:3 3:4 1:1 4:3 3:2 2:1".split())
    for lo, hi in zip(t["min_aspect"].to_pylist(), t["max_aspect"].to_pylist()):
        assert 0.5 <= lo <= hi <= 2.0


def test_channel_pixel_stats_match_direct_loop():
    from raycrawl.core.codec import synth_pixels
    from raycrawl.ops.imageprep import image_channel_pixel_stats

    t = image_channel_pixel_stats(SF)
    assert t.num_rows == 3

    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    n = 0
    s = np.zeros(3)
    ss = np.zeros(3)
    for d in ids:
        w, h = 32 + (d * 7) % 33, 32 + (d * 11) % 33
        px = synth_pixels(d, w, h).reshape(-1, 3).astype(np.float64)
        # jpeg rows round-trip through the lossy quantizer (midpoint
        # dequant, clipped), like the op sees
        if d % 2 != 0:
            px = np.clip((px // 4) * 4 + 2, 0, 255)
        n += px.shape[0]
        s += px.sum(axis=0)
        ss += (px * px).sum(axis=0)
    mean = s / n
    std = np.sqrt(ss / n - mean * mean)
    got = {c: (m, sd) for c, m, sd in zip(
        t["channel"].to_pylist(), t["mean"].to_pylist(), t["std"].to_pylist())}
    for i, c in enumerate("rgb"):
        assert got[c][0] == pytest.approx(mean[i], abs=1e-5)
        assert got[c][1] == pytest.approx(std[i], abs=1e-5)
    assert t["n_px"][0].as_py() == n


def test_wds_shard_assignment_deterministic_and_balanced():
    from raycrawl.ops.imageprep import N_WDS_SHARDS, _fnv1a64_fixed12

    ids = np.array([f"img-{i:08d}" for i in range(10_000)])
    h1 = _fnv1a64_fixed12(ids)
    h2 = _fnv1a64_fixed12(ids)
    assert (h1 == h2).all()

    # reference scalar FNV-1a on a sample
    def fnv(sx: str) -> int:
        h = 0xCBF29CE484222325
        for b in sx.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    for i in (0, 7, 999, 9999):
        assert int(h1[i]) == fnv(ids[i])

    shard = h1 % np.uint64(N_WDS_SHARDS)
    counts = np.bincount(shard.astype(int), minlength=N_WDS_SHARDS)
    assert counts.min() > 0.7 * counts.mean()  # hash balance, no empty shard


def test_wds_shard_write_roundtrip(tmp_path):
    """The shard column + resumable hive sink compose into a real
    WebDataset-style shard write: re-reading the shards reproduces the
    corpus exactly, partitioned by the hash shard."""
    from raycrawl.io.partsink import read_partitioned, write_partitioned_resumable
    from raycrawl.ops.imageprep import wds_shard_column

    ids = [f"img-{i:08d}" for i in range(512)]
    t = pa.table({"image_id": pa.array(ids, pa.string()),
                  "payload": pa.array([i % 251 for i in range(512)], pa.int64())})
    ds = ray.data.from_arrow(t).map_batches(
        wds_shard_column, batch_format="pyarrow")
    out = str(tmp_path / "wds")
    write_partitioned_resumable(ds, out, "shard")

    back = read_partitioned(out, "shard").to_pandas()
    assert len(back) == 512
    assert sorted(back["image_id"]) == sorted(ids)
    assert back.groupby("shard").size().gt(0).all()


def test_alignment_gate_stub_math():
    from raycrawl.ops.imageprep import clip_alignment_filter_stats

    t = clip_alignment_filter_stats(SF)
    rows = {g: (n, lo, hi) for g, n, lo, hi in zip(
        t["gate"].to_pylist(), t["n"].to_pylist(),
        t["min_score"].to_pylist(), t["max_score"].to_pylist())}
    assert set(rows) == {"keep", "drop"}
    assert rows["keep"][1] >= 0.5 and rows["drop"][2] < 0.5
    # score range is structurally [0.2, 1.0]
    assert rows["drop"][1] >= 0.2 and rows["keep"][2] <= 1.0


# ------------------------------------------------ incremental novelty dedup


def test_bloom_prefilter_contract():
    """No false negatives ever; false positives rare at the sized load."""
    import numpy as np

    from raycrawl.ops.dedup import (
        _NOVELTY_M_BITS, _bloom_maybe, _bloom_set, _splitmix64)

    rng = np.random.default_rng(7)
    inserted = rng.integers(0, 2**63, 200_000, dtype=np.uint64)
    probes = rng.integers(0, 2**63, 200_000, dtype=np.uint64)
    bits = np.zeros(_NOVELTY_M_BITS // 8, dtype=np.uint8)
    _bloom_set(bits, inserted)
    assert _bloom_maybe(bits, inserted).all(), "false negative"
    fresh = probes[~np.isin(probes, inserted)]
    fp = _bloom_maybe(bits, fresh).mean()
    assert fp < 0.01, f"false-positive rate {fp:.4f} too high"
    # splitmix must actually decorrelate the second probe
    assert (_splitmix64(inserted[:10]) != inserted[:10]).all()


def test_incremental_novelty_balanced_at_sf001():
    from raycrawl.ops.dedup import incremental_novelty_dedup

    t = incremental_novelty_dedup("/root/testdata/sf0.01")
    n_new = t["n_new"][0].as_py()
    n_known = t["n_known"][0].as_py()
    n_novel = t["n_novel"][0].as_py()
    assert n_new == n_known + n_novel
    assert n_known > 0 and n_novel > 0, "split should be non-degenerate"
