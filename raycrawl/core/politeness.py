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


class RobotsCache:
    """Synthetic robots.txt decisions, cached per host.

    Deterministic rules: a host whose SHA-1 first byte is ≡ 0 (mod 3)
    disallows paths starting with ``/private``; a host whose SHA-1 second
    byte is ≡ 0 (mod 5) declares a ``Crawl-delay`` that caps its fetch
    rate below the default token-bucket rate. ``fetches`` counts how many
    times a robots file was (synthetically) fetched — proving the cache is
    consulted once per host per actor, the analog of loading the abbreviation
    dictionary once (``Cansin_Location_Detection.py:54-66``).
    """

    def __init__(self) -> None:
        self.rules: dict[str, tuple[str, ...]] = {}
        self.delays: dict[str, float | None] = {}
        self.fetches = 0

    @staticmethod
    def _fetch_rules(host: str) -> tuple[tuple[str, ...], float | None]:
        h = hashlib.sha1(host.encode()).digest()
        disallow = ("/private",) if h[0] % 3 == 0 else ()
        # Crawl-delay: seconds between requests → rate = 1/delay
        delay = float(2 + h[1] % 4) if h[1] % 5 == 0 else None
        return disallow, delay

    def _ensure(self, host: str) -> None:
        if host not in self.rules:
            self.rules[host], self.delays[host] = self._fetch_rules(host)
            self.fetches += 1

    def allowed(self, host: str, path: str) -> bool:
        self._ensure(host)
        return not any(path.startswith(p) for p in self.rules[host])

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
