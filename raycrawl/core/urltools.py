"""URL canonicalization + SHA-1 keying.

The reference normalizes free-text locations against an abbreviation
dictionary before matching (``Cansin_Location_Detection.py:122-193``); the
crawl-engine analog is canonicalizing URLs before the seen-set check so the
same page never enters the frontier twice under two spellings.

Canonical form:
  * scheme + host lowercased
  * default ports stripped (``:80`` http, ``:443`` https)
  * fragment dropped
  * query parameters sorted by (key, value); empty query dropped
  * path ``.``/``..`` segments resolved, duplicate slashes collapsed
  * trailing slash kept only for the root path

``url_hash`` is the 20-byte SHA-1 of the canonical URL — the key of the
URL-seen set (bloom/cuckoo) and the dedup key everywhere (reference analog:
first-occurrence exact dedup, ``GenerateUserUseridDict.py:53-56``).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode, urljoin

_DEFAULT_PORT = {"http": "80", "https": "443"}

# tracking parameters stripped during canonicalization (they never change
# page content, only analytics attribution — keeping them would make the
# URL-seen set treat every campaign link as a distinct page)
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = {"gclid", "fbclid", "mc_cid", "mc_eid"}


def canonicalize_url(url: str, base: str | None = None) -> str:
    """Return the canonical form of ``url`` (optionally joined to ``base``)."""
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower() or "http"
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme, ""):
        netloc = f"{host}:{port}"
    # resolve path segments
    segs: list[str] = []
    for seg in parts.path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    path = "/" + "/".join(segs)
    pairs = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k not in _TRACKING_KEYS
        and not any(k.startswith(p) for p in _TRACKING_PREFIXES)
    ]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))


# Crawler-trap heuristics (classic spider-trap shapes: calendar loops,
# session-id mills, facet explosions). Purely URL-shape — no fetch needed,
# so the frontier can gate offers before spending a politeness token.
TRAP_MAX_DEPTH = 6    # path segments ≥ this → 'deep'
TRAP_MAX_PARAMS = 3   # query params ≥ this → 'params'


def trap_reason(canonical_url: str) -> str | None:
    """Classify a canonical URL as a likely crawler trap.

    Returns ``None`` for an ordinary URL, else the first matching reason:
    ``'deep'`` (path depth ≥ TRAP_MAX_DEPTH), ``'repeat'`` (a path segment
    occurs more than once — calendar/loop traps), ``'params'`` (≥
    TRAP_MAX_PARAMS query parameters — facet explosions)."""
    parts = urlsplit(canonical_url)
    segs = [s for s in parts.path.split("/") if s]
    if len(segs) >= TRAP_MAX_DEPTH:
        return "deep"
    if len(segs) != len(set(segs)):
        return "repeat"
    if parts.query and len(parse_qsl(parts.query, keep_blank_values=True)) >= TRAP_MAX_PARAMS:
        return "params"
    return None


def url_sha1(canonical_url: str) -> bytes:
    """20-byte SHA-1 of the canonical URL — the frontier/seen key."""
    return hashlib.sha1(canonical_url.encode("utf-8")).digest()


def host_of(canonical_url: str) -> str:
    return urlsplit(canonical_url).hostname or ""


def host_shard_key(host: str) -> int:
    """The 4-byte host hash that ``shard_of_host`` mods. Stored per seen
    digest in checkpoints (u32) so a reshard can recompute the owning
    shard for ANY shard count without knowing the host string — the key
    that makes seen-set redistribution exact instead of union-replicated."""
    h = hashlib.sha1(host.encode("utf-8")).digest()
    return int.from_bytes(h[:4], "big")


def shard_of_host(host: str, num_shards: int) -> int:
    """Stable host→shard partitioning (pins every host to ONE frontier shard
    so its politeness token bucket is owned by exactly one actor)."""
    return host_shard_key(host) % num_shards
