"""Per-host politeness token bucket + robots.txt decision cache.

Reference analog: the crawler sleeps ``seconds_per_req * topic_count -
exec_time + 1`` per round with ``seconds_per_req = 2``
(``pages/Crawler.py:148-153``) — one global pace for everything. The crawl
engine replaces that with a per-host token bucket owned by the frontier
shard that owns the host (hosts are pinned to shards by
``shard_of_host``, so bucket state is never split across actors).

Time is VIRTUAL: every crawl epoch advances the clock by
``epoch_seconds``; no real sleeping happens in tests/benchmarks, yet the
per-host fetch budget per epoch is exactly what a wall-clock bucket would
allow — and is identical between the sequential oracle and the Ray engine,
which is what makes crawl-ordering parity achievable.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

_RATES = (0.5, 1.0, 2.0, 4.0)  # tokens/sec by host-hash bucket


def host_rate(host: str) -> float:
    """Deterministic tokens/sec for a host (synthetic politeness config)."""
    h = hashlib.sha1(host.encode()).digest()
    return _RATES[h[3] % len(_RATES)]


@dataclass
class TokenBucket:
    """A freshly-seen host starts with a full burst allowance (otherwise a
    host discovered mid-epoch could never be fetched in its first epoch)."""

    rate: float
    burst: float = 8.0
    tokens: float = field(default=-1.0)

    def __post_init__(self) -> None:
        if self.tokens < 0:
            self.tokens = self.burst

    def refill(self, seconds: float) -> None:
        self.tokens = min(self.burst, self.tokens + self.rate * seconds)

    def try_take(self) -> bool:
        if self.tokens >= 1.0:
            self.tokens -= 1.0
            return True
        return False


_ROBOTS_RE_CACHE: dict[str, "re.Pattern"] = {}


def _robots_regex(pattern: str):
    """REP pattern → anchored regex: literal text with ``*`` matching any
    run of characters and a trailing ``$`` anchoring the path end. Compiled
    once per pattern process-wide (the matcher runs per offered URL)."""
    import re

    rx = _ROBOTS_RE_CACHE.get(pattern)
    if rx is None:
        body, anchor = (pattern[:-1], True) if pattern.endswith("$") else (
            pattern, False)
        parts = [re.escape(p) for p in body.split("*")]
        rx = _ROBOTS_RE_CACHE[pattern] = re.compile(
            ".*".join(parts) + ("$" if anchor else "")
        )
    return rx


def robots_match(pattern: str, path: str) -> bool:
    """Does a REP Allow/Disallow pattern match ``path``? Patterns anchor at
    the path start (``re.match``), ``*`` is a wildcard, trailing ``$`` pins
    the path end — the Google REP subset real robots.txt files use."""
    return _robots_regex(pattern).match(path) is not None


class RobotsCache:
    """Synthetic robots.txt decisions, cached per host, with full REP
    per-path rule matching (Allow/Disallow + ``*`` wildcards + ``$``
    anchors, longest-matched-pattern wins, Allow wins length ties, no
    match → allowed — Google's documented evaluation order).

    Deterministic base rules: a host whose SHA-1 first byte is ≡ 0 (mod 3)
    disallows paths starting with ``/private``; a host whose SHA-1 second
    byte is ≡ 0 (mod 5) declares a ``Crawl-delay`` that caps its fetch
    rate below the default token-bucket rate. With ``rich=True`` (the
    per-path production surface; default off keeps every existing universe
    byte-identical) hosts additionally draw wildcard/anchor rule sets:
    SHA-1 byte 2 ≡ 0 (mod 4) disallows ``/p/*7$`` (page ids ending in 7),
    and a /private-disallowing host with byte 5 even re-allows exactly
    ``/private/p/2$`` — an Allow override that only longest-match
    semantics honor. ``fetches`` counts how many times a robots file was
    (synthetically) fetched — proving the cache is consulted once per host
    per actor, the analog of loading the abbreviation dictionary once
    (``Cansin_Location_Detection.py:54-66``).
    """

    def __init__(self, rich: bool = False) -> None:
        # rules: per-host tuple of (allow: bool, pattern: str), most
        # specific decided at query time by longest-matched-pattern
        self.rules: dict[str, tuple[tuple[bool, str], ...]] = {}
        self.delays: dict[str, float | None] = {}
        self.fetches = 0
        self.rich = rich

    @staticmethod
    def normalize_rules(raw) -> tuple[tuple[bool, str], ...]:
        """Checkpoint/merge loader: JSON round-trips rules as lists, and
        pre-round-4 checkpoints stored bare disallow-prefix strings —
        normalize both to (allow, pattern) tuples."""
        out = []
        for r in raw:
            if isinstance(r, str):  # legacy format: disallow prefix
                out.append((False, r))
            else:
                allow, pattern = r
                out.append((bool(allow), str(pattern)))
        return tuple(out)

    def _fetch_rules(self, host: str) -> tuple[tuple, float | None]:
        h = hashlib.sha1(host.encode()).digest()
        rules: list[tuple[bool, str]] = []
        if h[0] % 3 == 0:
            rules.append((False, "/private"))
            if self.rich and h[5] % 2 == 0:
                rules.append((True, "/private/p/2$"))
        if self.rich and h[2] % 4 == 0:
            rules.append((False, "/p/*7$"))
        # Crawl-delay: seconds between requests → rate = 1/delay
        delay = float(2 + h[1] % 4) if h[1] % 5 == 0 else None
        return tuple(rules), delay

    def _ensure(self, host: str) -> None:
        if host not in self.rules:
            self.rules[host], self.delays[host] = self._fetch_rules(host)
            self.fetches += 1

    def allowed(self, host: str, path: str) -> bool:
        self._ensure(host)
        best_len = -1
        best_allow = True  # no matching rule → allowed
        for allow, pattern in self.rules[host]:
            if robots_match(pattern, path):
                n = len(pattern)
                # longest matched pattern wins; Allow wins a length tie
                if n > best_len or (n == best_len and allow):
                    best_len, best_allow = n, allow
        return best_allow

    def crawl_delay(self, host: str) -> float | None:
        self._ensure(host)
        return self.delays[host]


class HostPoliteness:
    """Bundle of per-host token buckets for one frontier shard."""

    def __init__(self, epoch_seconds: float = 2.0, burst: float = 8.0,
                 rate_fn=None):
        self.epoch_seconds = epoch_seconds
        self.burst = burst
        # rate_fn(host) -> tokens/sec override (e.g. robots Crawl-delay cap)
        self.rate_fn = rate_fn or host_rate
        self.buckets: dict[str, TokenBucket] = {}

    def bucket(self, host: str) -> TokenBucket:
        b = self.buckets.get(host)
        if b is None:
            b = self.buckets[host] = TokenBucket(rate=self.rate_fn(host),
                                                 burst=self.burst)
        return b

    def refill_all(self) -> None:
        # rates are re-evaluated every refill: effective rate is dynamic
        # (robots Crawl-delay discovered later, error-backoff streaks)
        for host, b in self.buckets.items():
            b.rate = self.rate_fn(host)
            b.refill(self.epoch_seconds)

    def try_take(self, host: str) -> bool:
        return self.bucket(host).try_take()
