"""URL-seen sketches: counting Bloom filter + cuckoo filter + phash index.

The reference's seen-set is an O(n) Python list scan
(``GenerateUserUseridDict.py:53-56``) or a Redis round-trip
(``Cansin_Location_Detection.py:107-117``). At 10^10-URL frontier scale the
seen-set must be a fixed-memory sketch: a counting Bloom filter (deletable,
mergeable) backed by a cuckoo filter (deletable, ~2 bytes/key at 4-slot
buckets). Keys are 20-byte SHA-1 of the canonical URL; both sketches derive
their hash slots from independent 64-bit slices of that digest, so no extra
hashing happens on the hot path.

Exactness: at test scale each shard also keeps an exact ``set`` of digests —
membership answers come from the sketches and are *verified* against the
exact set (no false negatives allowed; false positives counted and reported
in the shard metrics). At 10^10 scale the exact set is dropped and the
documented false-positive budget applies (see ``fp_budget`` docstring).
"""

from __future__ import annotations

import numpy as np


def _h64(digest: bytes, off: int) -> int:
    """64-bit slice of a SHA-1 digest (wraps; digest is 20 bytes)."""
    d = digest + digest
    return int.from_bytes(d[off : off + 8], "big")


class CountingBloomFilter:
    """Counting Bloom filter over SHA-1 digests.

    ``m`` uint8 counters, ``k`` slots per key via double hashing
    h_i = (h1 + i*h2) mod m (Kirsch–Mitzenmacher). Saturating counters
    (a counter stuck at 255 is never decremented — standard safety rule).

    fp_budget: with m/n = 16 bits/key and k = 8 the false-positive rate is
    ~6e-4; for the 10^10-URL model that is 160 GB of counters cluster-wide,
    i.e. ~0.6 GB per shard at 256 shards — sized per shard via ``expected``.
    """

    def __init__(self, expected: int, bits_per_key: int = 16, k: int = 8):
        self.m = max(64, int(expected) * bits_per_key)
        self.k = k
        self.counts = np.zeros(self.m, dtype=np.uint8)

    def _slots(self, digest: bytes) -> np.ndarray:
        h1, h2 = _h64(digest, 0), _h64(digest, 8) | 1
        return (h1 + np.arange(self.k, dtype=np.uint64) * h2) % self.m

    def add(self, digest: bytes) -> None:
        s = self._slots(digest)
        sel = self.counts[s] < 255
        self.counts[s[sel]] += 1

    def remove(self, digest: bytes) -> None:
        s = self._slots(digest)
        sel = (self.counts[s] > 0) & (self.counts[s] < 255)
        self.counts[s[sel]] -= 1

    def __contains__(self, digest: bytes) -> bool:
        return bool((self.counts[self._slots(digest)] > 0).all())

    def merge(self, other: "CountingBloomFilter") -> None:
        """Union by saturating counter add (shard-checkpoint merge path)."""
        assert self.m == other.m and self.k == other.k
        s = self.counts.astype(np.uint16) + other.counts.astype(np.uint16)
        self.counts = np.minimum(s, 255).astype(np.uint8)


class CuckooFilter:
    """Cuckoo filter (4-slot buckets, 16-bit fingerprints) over SHA-1 digests.

    Supports delete (needed when a URL is evicted/re-prioritized) and holds
    ~0.95 load at 4 slots/bucket. Fingerprint 0 is reserved for "empty".
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, expected: int):
        nb = 1
        while nb * self.SLOTS < int(expected) * 1.1:
            nb *= 2
        self.nbuckets = max(8, nb)
        self.buckets = np.zeros((self.nbuckets, self.SLOTS), dtype=np.uint16)
        self.size = 0

    def _fp_and_buckets(self, digest: bytes) -> tuple[int, int, int]:
        fp = (_h64(digest, 4) & 0xFFFF) or 1
        i1 = _h64(digest, 0) % self.nbuckets
        i2 = (i1 ^ (fp * 0x5BD1E995)) % self.nbuckets
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ (fp * 0x5BD1E995)) % self.nbuckets

    def add(self, digest: bytes) -> bool:
        fp, i1, i2 = self._fp_and_buckets(digest)
        for i in (i1, i2):
            row = self.buckets[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        # evict loop
        rng = np.random.Generator(np.random.PCG64(fp ^ i1))
        i = int(rng.choice([i1, i2]))
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(0, self.SLOTS))
            fp, self.buckets[i, slot] = int(self.buckets[i, slot]), fp
            i = self._alt(i, fp)
            row = self.buckets[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        return False  # table full — caller must grow / flush to exact table

    def __contains__(self, digest: bytes) -> bool:
        fp, i1, i2 = self._fp_and_buckets(digest)
        return bool((self.buckets[i1] == fp).any() or (self.buckets[i2] == fp).any())

    def remove(self, digest: bytes) -> bool:
        fp, i1, i2 = self._fp_and_buckets(digest)
        for i in (i1, i2):
            hit = np.nonzero(self.buckets[i] == fp)[0]
            if len(hit):
                self.buckets[i, hit[0]] = 0
                self.size -= 1
                return True
        return False


class SeenSet:
    """Sharded URL-seen set = counting Bloom + cuckoo + exact side table.

    ``check_and_add`` is the single entry point: returns True if the digest
    was already seen (and leaves state unchanged), else records it and
    returns False. The exact set guarantees parity with the sequential
    oracle at test scale; ``fp_observed`` counts sketch false positives that
    the exact set corrected (reported in lineage metrics).
    """

    def __init__(self, expected: int = 4096, exact: bool = True):
        self.bloom = CountingBloomFilter(expected)
        self.cuckoo = CuckooFilter(expected)
        self.exact: set[bytes] | None = set() if exact else None
        self.fp_observed = 0
        self.count = 0

    def __contains__(self, digest: bytes) -> bool:
        maybe = digest in self.bloom and digest in self.cuckoo
        if self.exact is None:
            return maybe
        truth = digest in self.exact
        if maybe and not truth:
            self.fp_observed += 1
        return truth

    def check_and_add(self, digest: bytes) -> bool:
        seen = digest in self
        if not seen:
            self.bloom.add(digest)
            if not self.cuckoo.add(digest) or self.cuckoo.size > 0.9 * (
                self.cuckoo.nbuckets * CuckooFilter.SLOTS
            ):
                self._grow_cuckoo(digest)
            if self.exact is not None:
                self.exact.add(digest)
            self.count += 1
        return seen

    def _grow_cuckoo(self, pending: bytes) -> None:
        """Rebuild the cuckoo filter at double capacity when it saturates
        (~95% load or a failed insert). At test scale the exact side table
        provides the keys; at 10^10 scale pre-size ``expected`` instead —
        growth there would require replaying the seen log (the checkpointed
        frontier+seen tables make that possible, but it is a stop-the-shard
        operation and sizing correctly up front is the intended path)."""
        if self.exact is None:  # pragma: no cover - production sizing path
            raise RuntimeError(
                "cuckoo filter saturated and no exact table to rebuild from; "
                "size SeenSet(expected=...) for the planned URL volume"
            )
        new = CuckooFilter(max(64, 2 * self.cuckoo.nbuckets * CuckooFilter.SLOTS))
        for k in self.exact:
            new.add(k)
        new.add(pending)
        self.cuckoo = new

    def state(self) -> dict:
        """Checkpointable state (numpy arrays + exact digests)."""
        return {
            "bloom": self.bloom.counts,
            "cuckoo": self.cuckoo.buckets,
            "exact": b"".join(sorted(self.exact)) if self.exact is not None else b"",
            "count": self.count,
        }

    @classmethod
    def restore(cls, st: dict, expected: int = 4096) -> "SeenSet":
        s = cls(expected)
        s.bloom.counts = np.asarray(st["bloom"], dtype=np.uint8)
        s.bloom.m = len(s.bloom.counts)
        s.cuckoo.buckets = np.asarray(st["cuckoo"], dtype=np.uint16).reshape(-1, CuckooFilter.SLOTS)
        s.cuckoo.nbuckets = s.cuckoo.buckets.shape[0]
        raw = st["exact"]
        s.exact = {raw[i : i + 20] for i in range(0, len(raw), 20)}
        s.count = int(st["count"])
        return s


class PhashIndex:
    """Near-duplicate gate: 64-bit phash index answering Hamming ≤ radius.

    Multi-index trick: split each hash into 4 non-overlapping 16-bit chunks;
    any pair within Hamming distance ≤ 3 shares at least one exact chunk
    (pigeonhole), so candidate lookup is 4 dict probes + a vectorized XOR
    popcount over the (small) candidate lists. Scales linearly in stored
    hashes with tiny constant; the reference has no near-dup at all (the
    north rule adds it).
    """

    def __init__(self, radius: int = 2):
        """radius=-1 disables matching entirely (query always misses) —
        the knob coverage-invariant tests use to turn the suppression
        gate off while keeping every code path identical."""
        if radius > 3:
            raise ValueError("chunk index guarantees recall only for radius<=3")
        self.radius = radius
        self.hashes: list[int] = []
        self._chunks: list[dict[int, list[int]]] = [{} for _ in range(4)]

    @staticmethod
    def _chunk(h: int, j: int) -> int:
        return (h >> (16 * j)) & 0xFFFF

    def query(self, h: int) -> int | None:
        """Return an existing hash within ``radius``, else None."""
        hu = h & 0xFFFFFFFFFFFFFFFF
        cand: set[int] = set()
        for j in range(4):
            cand.update(self._chunks[j].get(self._chunk(hu, j), ()))
        for idx in cand:
            x = (self.hashes[idx] ^ hu) & 0xFFFFFFFFFFFFFFFF
            if bin(x).count("1") <= self.radius:
                return self.hashes[idx]
        return None

    def add(self, h: int) -> None:
        hu = h & 0xFFFFFFFFFFFFFFFF
        idx = len(self.hashes)
        self.hashes.append(hu)
        for j in range(4):
            self._chunks[j].setdefault(self._chunk(hu, j), []).append(idx)

    def state(self) -> np.ndarray:
        return np.array(self.hashes, dtype=np.uint64)

    @classmethod
    def restore(cls, arr: np.ndarray, radius: int = 2) -> "PhashIndex":
        p = cls(radius)
        for h in arr.tolist():
            p.add(int(h))
        return p
