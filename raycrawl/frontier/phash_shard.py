"""Global phash dedup tier: corpus-wide near-duplicate suppression.

The per-host-shard gate (frontier/shard.py) can only suppress near-dups
that land on the same host shard. Image duplication crosses hosts, so the
optional global tier shards the phash space by 16-bit CHUNK VALUE: each
64-bit hash has 4 non-overlapping chunks, and any pair within Hamming
distance ≤ 3 shares at least one identical chunk (pigeonhole) — so the
pair is guaranteed to meet on the shard that owns that shared chunk.

Deterministic two-phase protocol per epoch (driver-coordinated):

  judge  — every dedup shard receives the epoch's candidate
           (digest, phash) rows routed by chunk ownership, sorts them into
           GLOBAL frontier order, and walks them: a candidate is ``dup``
           if within radius of the committed index or of an earlier
           tentatively-admitted candidate in this walk. No state mutates.
  (driver ORs verdicts across shards: dup anywhere → suppressed)
  commit — shards insert only the globally-admitted hashes.

Because verdicts depend only on (committed state, the globally-ordered
candidate list), the outcome is independent of task scheduling — the same
property the rest of the engine relies on — and the sequential oracle
replays the identical protocol.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.sketches import PhashIndex


def phash_chunks(ph: int) -> list[int]:
    hu = ph & 0xFFFFFFFFFFFFFFFF
    return [(hu >> (16 * j)) & 0xFFFF for j in range(4)]


def owner_shards(ph: int, num_shards: int) -> set[int]:
    return {c % num_shards for c in phash_chunks(ph)}


class PhashDedupShard:
    """One shard of the global dedup tier (plain class; Ray-wrapped)."""

    def __init__(self, shard_id: int, num_shards: int, radius: int = 2):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.radius = radius
        self.index = PhashIndex(radius)
        self._judge_memo: dict[int, list[bool]] = {}
        self._commit_memo: set[int] = set()

    def _owns(self, ph: int) -> bool:
        return self.shard_id in owner_shards(ph, self.num_shards)

    def judge(self, epoch: int, phashes: list[int], order_keys: list[tuple]) -> list[bool]:
        """Phase 1: dup verdicts for this epoch's candidates (aligned with
        the input), processed in global frontier order; read-only."""
        if epoch in self._judge_memo:
            return self._judge_memo[epoch]
        order = sorted(range(len(phashes)), key=lambda i: order_keys[i])
        tentative = PhashIndex(self.radius)
        verdicts = [False] * len(phashes)
        for i in order:
            ph = phashes[i]
            if self.index.query(ph) is not None or tentative.query(ph) is not None:
                verdicts[i] = True
            else:
                tentative.add(ph)
        self._judge_memo[epoch] = verdicts
        return verdicts

    def commit(self, epoch: int, admitted: list[int]) -> int:
        """Phase 2: insert the globally-admitted hashes this shard owns."""
        if epoch in self._commit_memo:
            return 0
        n = 0
        for ph in admitted:
            if self._owns(ph):
                self.index.add(ph)
                n += 1
        self._commit_memo.add(epoch)
        return n

    # ---------------------------------------------------------- checkpoint
    def checkpoint(self, ckpt_dir: str, epoch: int) -> None:
        d = os.path.join(ckpt_dir, f"epoch={epoch}", f"phash_shard={self.shard_id}")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "index.npy"), self.index.state())

    @classmethod
    def restore(
        cls, ckpt_dir: str, epoch: int, shard_id: int, num_shards: int,
        radius: int = 2,
    ) -> "PhashDedupShard":
        self = cls(shard_id, num_shards, radius)
        p = os.path.join(
            ckpt_dir, f"epoch={epoch}", f"phash_shard={shard_id}", "index.npy"
        )
        self.index = PhashIndex.restore(np.load(p), radius)
        return self
