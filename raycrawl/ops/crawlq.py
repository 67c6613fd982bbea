"""Crawl-engine and multimodal queries for the driver gate (rows-only:
the crawl and the fake codecs are not expressible in SQL; their exactness
is pinned by the oracle-parity pytest suite instead).

The synthetic web universe is sized from the sf's ``documents`` rowcount so
the workload scales with sf like every other query.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq
import ray.data

from ..core.webgraph import WebConfig, seed_urls
from .common import table
from .queries import register

_CRAWL_CACHE: dict[str, str] = {}


def _crawl_out_dir(sf_dir: str) -> str:
    """Run (once per sf_dir per process) a crawl whose universe scales with
    the sf, returning the payload/checkpoint directory."""
    if sf_dir in _CRAWL_CACHE:
        return _CRAWL_CACHE[sf_dir]
    from ..crawler import CrawlConfig, run_crawl

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_hosts = 16
    web = WebConfig(n_hosts=n_hosts, pages_per_host=max(4, n_docs // n_hosts))
    # stable digest (Python str hash is PYTHONHASHSEED-randomized) + pid so
    # re-runs reuse the same dir and concurrent processes cannot collide
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    out = f"/tmp/raycrawl_q/{tag}-{os.getpid()}"
    cfg = CrawlConfig(
        web=web,
        out_dir=out,
        num_shards=4,
        max_epochs=60,
        epoch_seconds=8.0,  # larger virtual epochs → fewer, denser epochs
        burst=16.0,  # denser politeness budget → fewer epochs to exhaustion
    )
    run_crawl(cfg, seed_urls(web))
    _CRAWL_CACHE[sf_dir] = out
    return out


@register("crawl_payload", sql=None)
def crawl_payload(sf_dir: str):
    """The flagship output: fetched image+caption payload rows
    (input_hint schema minus raw bytes, plus lineage columns).

    Built on ``crawler.read_payload`` so the near-dup-suppressed sidecar
    anti-filter applies (suppressed pages emit no payload row — oracle.py
    contract item 5) and the read is column-pruned (``bytes`` never leaves
    storage)."""
    from ..crawler import read_payload

    out = _crawl_out_dir(sf_dir)
    return read_payload(
        out,
        columns=["image_id", "w", "h", "fmt", "caption", "phash",
                 "url", "shard", "epoch"],
    )


@register("crawl_frontier_metrics", sql=None)
def crawl_frontier_metrics(sf_dir: str):
    """Per-shard lineage metrics from the final checkpoint manifests."""
    import json

    import pandas as pd

    from ..crawler import latest_checkpoint_epoch

    out = _crawl_out_dir(sf_dir)
    epoch = latest_checkpoint_epoch(out)
    rows = []
    ckpt = os.path.join(out, "checkpoints", f"epoch={epoch}")
    for d in sorted(os.listdir(ckpt)):
        if not d.startswith("shard="):
            continue
        with open(os.path.join(ckpt, d, "manifest.json")) as f:
            m = json.load(f)
        rows.append(
            dict(
                shard=m["shard"],
                epoch=m["epoch"],
                **{k: m["metrics"].get(k, 0) for k in
                   ("offered", "accepted", "fetched", "robots_denied",
                    "phash_suppressed", "fetch_errors", "seen_count",
                    "bloom_cuckoo_false_positives", "robots_fetches")},
            )
        )
    return pd.DataFrame(rows)


# ----------------------------------------------------------- multimodal


def _payload_images(sf_dir: str) -> ray.data.Dataset:
    """Deterministic image payload table derived from documents (one image
    per doc, seeded by doc_id) — input_hint shape without running a crawl.
    Returned LAZY so each consumer pipelines build→consume (a materialized
    cache was measured slower: the barrier costs more than the rebuild)."""
    import pyarrow as pa

    from ..core.codec import encode_image, phash64, synth_pixels

    ds = table(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids, blobs, ws, hs, fmts, phs = [], [], [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            w = 32 + (doc_id * 7) % 33
            h = 32 + (doc_id * 11) % 33
            fmt = "png" if doc_id % 2 == 0 else "jpeg"
            px = synth_pixels(doc_id, w, h)
            ids.append(f"img-{doc_id:08d}")
            blobs.append(encode_image(px, fmt))
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            phs.append(phash64(px))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.large_binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "phash": pa.array(phs, pa.int64()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", batch_size=128)


@register("image_feature_extract", sql=None)
def image_feature_extract(sf_dir: str):
    from ..stages.multimodal import ImageFeatures

    return _payload_images(sf_dir).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    )


@register("image_resize_32", sql=None)
def image_resize_32(sf_dir: str):
    from ..stages.multimodal import ImageResize

    return (
        _payload_images(sf_dir)
        .map_batches(ImageResize, fn_constructor_args=(32, 32),
                     batch_format="pyarrow", batch_size=64, concurrency=(1, 8))
        .drop_columns(["bytes"])
    )


@register("video_frame_sample_phash", sql=None)
def video_frame_sample_phash(sf_dir: str):
    import pyarrow as pa

    from ..stages.multimodal import FrameSampler, synth_video

    ds = table(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "video_id": pa.array([f"vid-{i:08d}" for i in ids], pa.string()),
                "bytes": pa.array(
                    [synth_video(i, n_frames=4) for i in ids], pa.large_binary()
                ),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", batch_size=64).map_batches(
        FrameSampler, fn_constructor_args=(2,), batch_format="pyarrow",
        batch_size=32, concurrency=(1, 8),
    )


@register("audio_feature_extract", sql=None)
def audio_feature_extract(sf_dir: str):
    import pyarrow as pa

    from ..stages.multimodal import AudioFeatures, synth_audio

    ds = table(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "audio_id": pa.array([f"aud-{i:08d}" for i in ids], pa.string()),
                "bytes": pa.array(
                    [synth_audio(i, seconds=0.25) for i in ids], pa.large_binary()
                ),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", batch_size=128).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    )


@register("frontier_compaction", sql=None)
def frontier_compaction(sf_dir: str):
    """Offline frontier merge as a groupby-aggregate shuffle: duplicate
    discovered-URL rows (same URL from several sources/runs) collapse to
    one row with min depth / min discovered_at, re-keyed to a new shard
    count (re-sharding a checkpointed frontier)."""
    import pyarrow as pa
    import ray.data

    from ..core.urltools import url_sha1, host_of
    from ..core.webgraph import page_url, priority_of
    from ..frontier.compact import compact_frontier

    # deterministic duplicated link-log derived from documents: each doc
    # contributes its URL at two different depths (two "source runs")
    ds = table(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        urls, depths, discs = [], [], []
        for doc_id in t["doc_id"].to_pylist():
            u = page_url(doc_id % 64, doc_id % 97)
            for d in (doc_id % 5 + 1, doc_id % 3 + 1):
                urls.append(u)
                depths.append(d)
                discs.append(doc_id % 7)
        digests = [url_sha1(u) for u in urls]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "url_hash": pa.array(digests, pa.binary()),
                "host": pa.array([host_of(u) for u in urls], pa.string()),
                "priority": pa.array([priority_of(d) for d in digests], pa.int32()),
                "depth": pa.array(depths, pa.int32()),
                "discovered_at": pa.array(discs, pa.int64()),
            }
        )

    links = ds.map_batches(build, batch_format="pyarrow")
    return compact_frontier(links, num_shards=16).select_columns(
        ["url", "depth", "discovered_at", "priority", "shard"]
    )


PHASH_GROUP_RADIUS = 2


def _popcount64(v):
    """Vectorized 64-bit popcount (SWAR; uint64 wraps are intended)."""
    import numpy as np

    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def greedy_leader_groups(pairs) -> dict[str, str]:
    """Deterministic greedy leader clustering over near-dup edges: walk
    items in id order; an item joins the SMALLEST-id leader among its
    in-radius neighbors, else becomes a leader itself. Returns the
    dup→leader assignment (items without edges are trivially leaders).
    Matches the sequential first-occurrence-wins semantics of the phash
    gate (oracle-pinned in tests) with an order-free tie-break."""
    from collections import defaultdict

    nbrs: dict[str, list[str]] = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    assign: dict[str, str] = {}
    leaders: set[str] = set()
    for i in sorted(nbrs):
        cands = [j for j in nbrs[i] if j < i and j in leaders]
        if cands:
            assign[i] = min(cands)
        else:
            leaders.add(i)
    return assign


@register("image_phash_neardup_groups", sql=None)
def image_phash_neardup_groups(sf_dir: str):
    """Near-duplicate image grouping over the input_hint payload table,
    fully distributed (no full-corpus driver materialization):

    1. (image_id, phash) rows — 16 B each, bytes never leave the build
       tasks — explode to their 4 non-overlapping 16-bit phash chunks;
       any pair within Hamming ≤ 3 shares a chunk (pigeonhole), so a
       ``groupby(chunk_key)`` shuffle co-locates every candidate pair.
    2. Inside each (small) chunk bucket: vectorized XOR + popcount emits
       the true in-radius edges. Edge volume ≈ actual near-dup pairs
       (×≤4 chunk copies), orders of magnitude below the corpus. A hot
       chunk value (low-entropy hash region) would need salting/splitting
       at 10^9 images — documented, not needed for 64-bit phashes.
    3. Driver: deterministic greedy leader clustering over ONLY the edged
       items (``greedy_leader_groups``); the dup→keeper map (small) is
       broadcast and applied per batch, then one ``groupby(keeper)``
       count yields the groups.

    Near-dups are injected deterministically (every doc pair 2k/2k+1
    shares a base image with ±1 noise); output = one row per group
    (keeper, group_size)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count

    from ..core.codec import encode_image, phash64, synth_pixels, decode_image

    ds = table(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids, blobs, phs = [], [], []
        for doc_id in t["doc_id"].to_pylist():
            base_seed = doc_id // 2  # pairs share a base image
            w, h = 40 + base_seed % 17, 40 + base_seed % 13
            px = synth_pixels(base_seed, w, h)
            if doc_id % 2 == 1:
                rng = np.random.Generator(np.random.PCG64(doc_id))
                px = np.clip(
                    px.astype(np.int16) + rng.integers(-1, 2, px.shape), 0, 255
                ).astype(np.uint8)
            data = encode_image(px, "png")
            ids.append(f"img-{doc_id:08d}")
            blobs.append(data)
            phs.append(phash64(decode_image(data)[0]))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.large_binary()),
                "phash": pa.array(phs, pa.int64()),
            }
        )

    payload = ds.map_batches(build, batch_format="pyarrow", batch_size=128)
    meta = payload.select_columns(["image_id", "phash"])

    def explode_chunks(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        phu = ph.view(np.uint64)
        keys = []
        for j in range(4):
            keys.append((phu >> np.uint64(16 * j)) & np.uint64(0xFFFF) | np.uint64(j << 16))
        return pa.table(
            {
                "chunk_key": pa.array(
                    np.concatenate(keys).astype(np.int64), pa.int64()
                ),
                "image_id": pa.concat_arrays(
                    [t["image_id"].combine_chunks()] * 4
                ),
                "phash": pa.concat_arrays([t["phash"].combine_chunks()] * 4),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object")})
        phu = g["phash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = g["image_id"].to_numpy()
        d = _popcount64(phu[:, None] ^ phu[None, :])
        ai, bi = np.where(np.triu(d <= PHASH_GROUP_RADIUS, k=1))
        a, b = ids[ai], ids[bi]
        return pd.DataFrame(
            {"a": np.minimum(a, b), "b": np.maximum(a, b)}
        )

    edges = (
        meta.map_batches(explode_chunks, batch_format="pyarrow")
        .groupby("chunk_key")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()  # bounded by near-dup pair count, not the corpus
    )
    import ray as _ray

    assign = greedy_leader_groups(
        {(a, b) for a, b in zip(edges["a"], edges["b"])}
    )
    assign_ref = _ray.put(assign)

    def to_keeper(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(assign_ref)
        keeper = df["image_id"].map(m).fillna(df["image_id"])
        return pd.DataFrame({"keeper": keeper})

    return (
        meta.map_batches(to_keeper, batch_format="pandas")
        .groupby("keeper")
        .aggregate(Count(alias_name="group_size"))
    )
