"""Sequential reference-semantics oracle crawler.

This is the golden implementation the Ray Data engine must match EXACTLY
(crawl ordering, URL-seen set, payload rows). It is written in the
reference's sequential idiom on purpose — plain lists/sets/dicts, linear
scans, first-occurrence-wins (cf. ``GenerateUserUseridDict.py:53-56``,
round-robin polling ``pages/Crawler.py:54-70``) — and shares NO frontier /
sketch code with the engine, so a parity test between the two is a real
cross-check, not a tautology.

Crawl semantics (the spec both implementations follow):

1. State is partitioned into ``num_shards`` host-shards
   (``shard_of_host``); every host belongs to exactly one shard.
2. Frontier order is the data property
   ``(-priority, depth, discovered_at, url_hash)`` — priority is a pure
   function of the canonical URL, depth is min hops from a seed,
   discovered_at is the epoch the URL was first accepted.
3. URLs enter the frontier through a single enqueue path: canonicalize →
   per-shard URL-seen check (membership recorded at ENQUEUE time,
   first-occurrence-wins; seeds included) → robots check (cached per-host
   decision; disallowed → status ``robots_denied`` logged at
   ``epoch = discovered_at``, URL stays in the seen set but never enters
   the frontier) → push ordered by the key in (2).
4. Per epoch: refill per-host token buckets by ``rate·epoch_seconds``
   (capped at burst; a freshly seen host starts at full burst); walk the
   frontier in order; a URL whose host has no token is skipped (kept for
   later epochs, host stays blocked for the rest of the epoch); otherwise
   one token is consumed and the URL is fetched.
5. Fetched pages pass a per-shard phash near-dup gate in frontier order;
   the gating phash is computed from the DECODED payload bytes (pixels as
   a consumer would see them). A page whose phash is within Hamming
   ``phash_radius`` of one already accepted on that shard is suppressed
   (status ``dup_suppressed`` — no payload row, outlinks NOT enqueued,
   i.e. near-dups gate re-enqueue).
6. Surviving pages emit one payload row (input_hint schema) and their
   outlinks: canonicalized against the page URL, deduplicated within the
   epoch keeping min depth, then fed to (3) with
   ``discovered_at = epoch + 1``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .core.urltools import canonicalize_url, url_sha1, host_of, shard_of_host, trap_reason
from .core.politeness import host_rate, RobotsCache
from .core.webgraph import WebConfig, page_for, priority_of, fetch_fails
from .core.codec import (hamming64, phash64, decode_image,
                         content_etag)

BURST = 8.0


@dataclass
class OracleResult:
    fetch_log: list[dict] = field(default_factory=list)
    payload: list[dict] = field(default_factory=list)
    seen: dict[int, set[bytes]] = field(default_factory=dict)
    metrics: dict[int, dict] = field(default_factory=dict)
    epochs: int = 0


def order_key(item: dict) -> tuple:
    return (-item["priority"], item["depth"], item["discovered_at"], item["digest"])


def oracle_crawl(
    cfg: WebConfig,
    seeds: list[str],
    max_epochs: int = 50,
    num_shards: int = 4,
    epoch_seconds: float = 2.0,
    phash_radius: int = 2,
    burst: float = BURST,
    global_phash_dedup: bool = False,
    num_phash_shards: int = 4,
    trap_filter: bool = False,
    host_priority_boost: dict | None = None,
    epoch_pop_budget: int | None = None,
    max_pages_per_host: int | None = None,
    error_backoff: bool = False,
    focus_keywords: tuple | None = None,
    max_depth: int | None = None,
    etag_manifest: dict[bytes, bytes] | None = None,
    rich_robots: bool = False,
    seed_injections: dict[int, list[str]] | None = None,
) -> OracleResult:
    res = OracleResult()

    def _prio(digest: bytes, host: str) -> int:
        p = priority_of(digest)
        return (p + host_priority_boost.get(host, 0)
                if host_priority_boost else p)

    seen: dict[int, set[bytes]] = {s: set() for s in range(num_shards)}
    phash_seen: dict[int, list[int]] = {s: [] for s in range(num_shards)}
    global_phash_committed: dict[int, list[int]] = {
        s: [] for s in range(num_phash_shards)
    }
    frontier: list[dict] = []
    tokens: dict[str, float] = {}
    robots = RobotsCache(rich=rich_robots)
    metrics = {
        s: dict(offered=0, accepted=0, fetched=0, robots_denied=0,
                phash_suppressed=0, fetch_errors=0, trap_denied=0,
                quota_denied=0, quota_dropped=0, redirects_followed=0,
                depth_denied=0, not_modified=0, sitemap_expanded=0)
        for s in range(num_shards)
    }
    host_popped: dict[str, int] = {}
    # error-backoff streaks: consecutive fetch errors per host (engine:
    # FrontierShard.host_consec_errors)
    consec_errors: dict[str, int] = {}

    def enqueue(url: str, depth: int, discovered_at: int) -> None:
        digest = url_sha1(url)
        host = host_of(url)
        shard = shard_of_host(host, num_shards)
        metrics[shard]["offered"] += 1
        if digest in seen[shard]:  # first-occurrence-wins, reference D1
            return
        seen[shard].add(digest)
        if max_depth is not None and depth > max_depth:
            metrics[shard]["depth_denied"] += 1
            res.fetch_log.append(
                {**_log(dict(url=url, digest=digest, host=host, shard=shard,
                             priority=_prio(digest, host), depth=depth,
                             discovered_at=discovered_at), discovered_at),
                 "status": "depth_denied"}
            )
            return
        if trap_filter:
            reason = trap_reason(url)
            if reason:
                metrics[shard]["trap_denied"] += 1
                res.fetch_log.append(
                    {**_log(dict(url=url, digest=digest, host=host, shard=shard,
                                 priority=_prio(digest, host), depth=depth,
                                 discovered_at=discovered_at), discovered_at),
                     "status": f"trap_denied:{reason}"}
                )
                return
        item = dict(
            url=url,
            digest=digest,
            host=host,
            shard=shard,
            priority=_prio(digest, host),
            depth=depth,
            discovered_at=discovered_at,
        )
        path = "/" + url.split("://", 1)[1].split("/", 1)[1]
        if not robots.allowed(host, path):
            metrics[shard]["robots_denied"] += 1
            res.fetch_log.append({**_log(item, discovered_at), "status": "robots_denied"})
            return
        if (max_pages_per_host is not None
                and host_popped.get(host, 0) >= max_pages_per_host):
            metrics[shard]["quota_denied"] += 1
            res.fetch_log.append(
                {**_log(item, discovered_at), "status": "quota_denied"}
            )
            return
        metrics[shard]["accepted"] += 1
        frontier.append(item)

    injections = seed_injections or {}
    # seeds + epoch-0 injections dedup by canonical URL BEFORE enqueue
    # (first occurrence wins), mirroring the engine's pending dict — a
    # duplicated entry would otherwise double-count `offered` here while
    # the engine's dict collapses it pre-merge
    for url in dict.fromkeys(
        canonicalize_url(s) for s in [*seeds, *injections.get(0, [])]
    ):
        enqueue(url, 0, 0)

    def eff_rate(h: str) -> float:
        delay = robots.crawl_delay(h)
        r = host_rate(h)
        r = min(r, 1.0 / delay) if delay else r
        if error_backoff:
            r /= 1 << min(consec_errors.get(h, 0), 6)
        return r

    epoch = 0
    # continuous-crawl: the loop stays alive on an empty frontier while
    # a future injection (< max_epochs, the only ones the engine ever
    # delivers) is still scheduled — idle epochs tick politeness refills
    while epoch < max_epochs and (
        frontier or any(epoch < e < max_epochs for e in injections)
    ):
        for h in tokens:
            tokens[h] = min(burst, tokens[h] + eff_rate(h) * epoch_seconds)
        frontier.sort(key=order_key)
        selected: list[dict] = []
        remaining: list[dict] = []
        blocked: set[str] = set()
        shard_taken: dict[int, int] = {}
        for item in frontier:
            # per-SHARD pop budget (engine: FrontierShard.pop_budget) —
            # a capped shard keeps its politeness tokens for later epochs
            if (epoch_pop_budget is not None
                    and shard_taken.get(item["shard"], 0)
                    >= epoch_pop_budget):
                remaining.append(item)
                continue
            # lifetime host quota (engine: FrontierShard.host_quota) —
            # checked BEFORE politeness so no token is spent; at-quota
            # items are DROPPED from the frontier, mirroring the engine's
            # _drop_host_queue at the next pop encounter
            if (max_pages_per_host is not None
                    and host_popped.get(item["host"], 0)
                    >= max_pages_per_host):
                metrics[item["shard"]]["quota_dropped"] += 1
                continue
            if item["host"] in blocked:
                remaining.append(item)
                continue
            if item["host"] not in tokens:
                tokens[item["host"]] = burst
            if tokens[item["host"]] >= 1.0:
                tokens[item["host"]] -= 1.0
                selected.append(item)
                host_popped[item["host"]] = (
                    host_popped.get(item["host"], 0) + 1
                )
                shard_taken[item["shard"]] = (
                    shard_taken.get(item["shard"], 0) + 1
                )
            else:
                blocked.add(item["host"])
                remaining.append(item)
        frontier = remaining

        # global-dedup mode, phases 1+2: judge candidates in global
        # frontier order per chunk-shard (read-only), OR the verdicts,
        # commit the admitted hashes — replicating the engine's protocol
        globally_suppressed: set[bytes] = set()
        if global_phash_dedup:
            cands = []
            for item in selected:
                if fetch_fails(item["digest"]):
                    continue
                page = page_for(cfg, item["url"])
                if page.redirect_to is not None or page.sitemap:
                    continue  # 301 alias / sitemap: no pixels, never judged
                pixels, _ = decode_image(page.data)
                cands.append((item, phash64(pixels)))
            # selected is already in global frontier order
            for dshard in range(num_phash_shards):
                tentative: list[int] = []
                for item, ph in cands:
                    if dshard not in _owner_shards(ph, num_phash_shards):
                        continue
                    near = any(
                        hamming64(ph, p) <= phash_radius
                        for p in global_phash_committed[dshard]
                    ) or any(
                        hamming64(ph, p) <= phash_radius for p in tentative
                    )
                    if near:
                        globally_suppressed.add(item["digest"])
                    else:
                        tentative.append(ph)
            for item, ph in cands:
                if item["digest"] not in globally_suppressed:
                    for dshard in _owner_shards(ph, num_phash_shards):
                        global_phash_committed[dshard].append(ph)

        new_links: list[tuple[str, int]] = []
        for item in selected:
            shard = item["shard"]
            if fetch_fails(item["digest"]):
                metrics[shard]["fetch_errors"] += 1
                consec_errors[item["host"]] = (
                    consec_errors.get(item["host"], 0) + 1
                )
                res.fetch_log.append({**_log(item, epoch), "status": "fetch_error"})
                continue
            # HTTP fetch succeeded (even if later near-dup-suppressed):
            # the host's error streak resets
            consec_errors.pop(item["host"], None)
            page = page_for(cfg, item["url"])
            if page.redirect_to is not None:
                # 301 alias: no payload, no phash gate — the target enters
                # the frontier through the normal enqueue path at the SAME
                # depth (redirects do not deepen the crawl)
                metrics[shard]["redirects_followed"] += 1
                res.fetch_log.append(
                    {**_log(item, epoch), "status": "redirected"}
                )
                new_links.append(
                    (canonicalize_url(page.redirect_to, base=item["url"]),
                     item["depth"]),
                )
                continue
            if page.sitemap:
                # sitemap manifest: token spent, no payload, no phash —
                # entries offered at the SITEMAP'S OWN depth (seed
                # semantics); focused crawls do not gate manifests
                consec_errors.pop(item["host"], None)
                metrics[shard]["sitemap_expanded"] += 1
                res.fetch_log.append(
                    {**_log(item, epoch), "status": "sitemap"}
                )
                for raw in page.outlinks:
                    new_links.append(
                        (canonicalize_url(raw, base=item["url"]),
                         item["depth"])
                    )
                continue
            # gating phash comes from the DECODED payload (consumer view)
            pixels, _ = decode_image(page.data)
            ph = phash64(pixels)
            if etag_manifest is not None:
                et = content_etag(page.w, page.h, page.fmt, ph, page.caption)
                if etag_manifest.get(item["digest"]) == et:
                    # 304 analog: token spent, no payload, no phash-index
                    # entry — but the link graph STILL advances (focus
                    # gate applies, as for fetched pages). Same order as
                    # the engine gate (redirect -> error -> not_modified
                    # -> near-dup).
                    metrics[shard]["not_modified"] += 1
                    res.fetch_log.append(
                        {**_log(item, epoch), "status": "not_modified"}
                    )
                    if focus_keywords is not None:
                        lc = page.caption.lower()
                        if not any(k.lower() in lc for k in focus_keywords):
                            continue
                    for raw in page.outlinks:
                        new_links.append(
                            (canonicalize_url(raw, base=item["url"]),
                             item["depth"] + 1)
                        )
                    continue
            if global_phash_dedup:
                dup = item["digest"] in globally_suppressed
            else:
                dup = any(
                    hamming64(ph, p) <= phash_radius for p in phash_seen[shard]
                )
            if dup:
                metrics[shard]["phash_suppressed"] += 1
                res.fetch_log.append({**_log(item, epoch), "status": "dup_suppressed"})
                continue
            if not global_phash_dedup:
                phash_seen[shard].append(ph)
            metrics[shard]["fetched"] += 1
            res.fetch_log.append({**_log(item, epoch), "status": "fetched"})
            res.payload.append(
                dict(
                    image_id=page.image_id,
                    bytes=page.data,
                    w=page.w,
                    h=page.h,
                    fmt=page.fmt,
                    caption=page.caption,
                    phash=ph,
                    url=item["url"],
                    epoch=epoch,
                    shard=shard,
                )
            )
            # focused crawl: off-topic pages are stored but not expanded
            if focus_keywords is not None:
                lc = page.caption.lower()
                if not any(k.lower() in lc for k in focus_keywords):
                    continue
            for raw in page.outlinks:
                new_links.append((canonicalize_url(raw, base=item["url"]), item["depth"] + 1))

        # within-epoch dedup: keep min depth per canonical URL
        best: dict[str, int] = {}
        for url, depth in new_links:
            if url not in best or depth < best[url]:
                best[url] = depth
        # injections for epoch+1 merge into the SAME dedup space as the
        # outlinks (engine: both land in the shards' pending buffers and
        # merge at the next pop, min depth wins). Injections at
        # e == max_epochs are excluded: the engine's loop exits before
        # the top of that epoch, so they are never offered there either.
        if epoch + 1 < max_epochs:
            for s in injections.get(epoch + 1, []):
                u = canonicalize_url(s)
                if u not in best or 0 < best[u]:
                    best[u] = 0
        for url in sorted(best):
            enqueue(url, best[url], epoch + 1)
        epoch += 1

    res.seen = seen
    res.metrics = metrics
    res.epochs = epoch
    return res


def _owner_shards(ph: int, num_shards: int) -> set[int]:
    hu = ph & 0xFFFFFFFFFFFFFFFF
    return {((hu >> (16 * j)) & 0xFFFF) % num_shards for j in range(4)}


def _log(item: dict, epoch: int) -> dict:
    return dict(
        epoch=epoch,
        url=item["url"],
        url_hash=item["digest"].hex(),
        host=item["host"],
        shard=item["shard"],
        priority=item["priority"],
        depth=item["depth"],
        discovered_at=item["discovered_at"],
    )
