"""Fetch / decode / link-extraction stages — `map_batches` callables.

These are the per-record transform stages of the crawl pipeline, all
Arrow-in/Arrow-out (``batch_format="pyarrow"``):

* ``FetchWorker`` — callable class (per-process setup once, per-batch
  work in ``__call__``; see the cache note below) that "fetches" each
  popped URL with an in-task retry budget for transient failures. In this
  sandbox the fetch is the deterministic synthetic web (``page_for``); in
  production it holds the async HTTP client pool, the analog of the
  reference's single `tweepy.Client` (``pages/Crawler.py:162-192``).
* ``DecodePhash`` — callable class decoding payload bytes and computing
  the 64-bit perceptual hash of the DECODED pixels (the gating/near-dup
  key). Separate from fetch because fetch is IO-bound and decode is
  CPU-bound.
* ``ExplodeLinks`` — stateless task: one row per outlink, canonicalized
  against the page URL (link-extraction analog of the reference's
  ``RT @user:`` parsing, ``Stance_Detection.py:63-84``), keyed with
  SHA-1/host/shard/priority, with a within-batch min-depth combiner.
  The live crawl inlines this logic in ``decode_submit``; this class is
  the standalone Dataset operator for offline link-log processing
  (feeds ``frontier.compact.compact_frontier``).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.webgraph import (WebConfig, page_for, priority_of, fetch_fails,
                             fetch_transient_fails)
from ..core.urltools import canonicalize_url, url_sha1, host_of, shard_of_host
from ..core.codec import decode_image, phash64


# Per-worker-process stage caches. The crawl driver runs ONE short Dataset
# pipeline per epoch; spinning up a fresh actor pool per epoch would cost
# seconds of actor startup each time. Instead fetch/decode run as stateless
# TASKS whose per-process state (http session analog, DCT matrices) is
# built once per Ray worker process and reused across epochs — same
# amortization as an actor pool, without per-pipeline spin-up. (Stages
# with real mutable state — the frontier shards — stay actors.)
_FETCHERS: dict[WebConfig, "FetchWorker"] = {}
_DECODER: "DecodePhash | None" = None


def fetch_batch(batch: pa.Table, web_cfg: WebConfig) -> pa.Table:
    # cache key = the ENTIRE frozen config: a partial field tuple once let
    # a second crawl in the same Ray session (different trap_links) reuse
    # a stale worker and silently crawl the wrong universe
    f = _FETCHERS.get(web_cfg)
    if f is None:
        f = _FETCHERS[web_cfg] = FetchWorker(web_cfg)
    return f(batch)


def decode_batch(batch: pa.Table) -> pa.Table:
    global _DECODER
    if _DECODER is None:
        _DECODER = DecodePhash()
    return _DECODER(batch)


class FetchWorker:
    RETRY_BUDGET = 2  # in-task retries for transient (5xx/timeout) failures

    def __init__(self, web_cfg: WebConfig):
        self.cfg = web_cfg  # in production: http session pool, TLS contexts
        self.retries = 0  # per-worker retry counter (observability)

    def _fetch_with_retries(self, url: str, digest: bytes):
        for attempt in range(self.RETRY_BUDGET + 1):
            if fetch_transient_fails(digest, attempt):
                self.retries += 1
                continue
            return page_for(self.cfg, url)
        return None  # retry budget exhausted (cannot happen with this rule)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages = []
        oks = []
        for u, d in zip(batch["url"].to_pylist(), batch["url_hash"].to_pylist()):
            if fetch_fails(d):
                pages.append(None)  # dead-letter: permanent 4xx analog
                oks.append(False)
            else:
                pages.append(self._fetch_with_retries(u, d))
                oks.append(pages[-1] is not None)
        return batch.append_column(
            "fetch_ok", pa.array(oks, pa.bool_())
        ).append_column(
            "image_id",
            pa.array([p.image_id if p else None for p in pages], pa.string()),
        ).append_column(
            "bytes",
            pa.array([p.data if p else None for p in pages], pa.large_binary()),
        ).append_column(
            "w", pa.array([p.w if p else 0 for p in pages], pa.int32())
        ).append_column(
            "h", pa.array([p.h if p else 0 for p in pages], pa.int32())
        ).append_column(
            "fmt", pa.array([p.fmt if p else None for p in pages], pa.string())
        ).append_column(
            "caption",
            pa.array([p.caption if p else None for p in pages], pa.string()),
        ).append_column(
            "outlinks",
            pa.array(
                [p.outlinks if p else [] for p in pages], pa.list_(pa.string())
            ),
        ).append_column(
            "redirect_to",
            pa.array(
                [p.redirect_to if p else None for p in pages], pa.string()
            ),
        ).append_column(
            "sitemap",
            pa.array([bool(p.sitemap) if p else False for p in pages],
                     pa.bool_()),
        )


class DecodePhash:
    def __init__(self) -> None:
        # force DCT matrix construction once per actor, not per batch
        from ..core import codec

        self._phash = codec.phash64
        self._decode = codec.decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        phashes = []
        for buf in batch["bytes"]:
            raw = buf.as_py()
            if raw is None:
                phashes.append(None)  # failed fetch — nothing to decode
                continue
            pixels, _ = self._decode(raw)
            phashes.append(self._phash(pixels))
        return batch.append_column("phash", pa.array(phashes, pa.int64()))


class ExplodeLinks:
    """outlinks → one canonical row per link (+ within-batch min-depth dedup)."""

    def __init__(self, num_shards: int):
        self.num_shards = num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        best: dict[str, int] = {}
        for base, depth, links in zip(
            batch["url"].to_pylist(),
            batch["depth"].to_pylist(),
            batch["outlinks"].to_pylist(),
        ):
            for raw in links or ():
                cu = canonicalize_url(raw, base=base)
                nd = depth + 1
                if cu not in best or nd < best[cu]:
                    best[cu] = nd
        urls = sorted(best)
        digests = [url_sha1(u) for u in urls]
        hosts = [host_of(u) for u in urls]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "url_hash": pa.array(digests, pa.binary()),
                "host": pa.array(hosts, pa.string()),
                "shard": pa.array(
                    [shard_of_host(h, self.num_shards) for h in hosts], pa.int32()
                ),
                "priority": pa.array([priority_of(d) for d in digests], pa.int32()),
                "depth": pa.array([best[u] for u in urls], pa.int32()),
            }
        )
