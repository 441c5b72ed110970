"""Sharded Bloom filter over the URL-seen set.

The north_rule's "partitioned Bloom/cuckoo URL-seen filter": correctness is
always the exact anti-join against the ``seen`` table (crawler.py:152's set
membership re-expressed); the Bloom is a *pre-filter* that lets the vast
majority of genuinely-new links skip the expensive probe of a 10^10-row
table. A link that misses the Bloom is **definitely unseen** (no false
negatives); only Bloom hits continue into the exact anti-join.

Sharding: keys are assigned to ``n_shards`` shards by ``hash mod n_shards``
— the same bucketing as the frontier/seen storage layout, so at cluster
scale each executor needs only the shard bitmaps co-located with its key
range. Sizing for 10^10 keys at 1% FPP is ~12 GB of bitmap total — e.g.
4096 shards × ~3 MB, far below executor memory; locally we default to a
few MB. Bit positions use Kirsch-Mitzenmacher double hashing
(g_i = h1 + i·h2 mod m) derived from the 64-bit url_hash, fully
numpy-vectorized.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ShardedBloom"]

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _h2(h: np.ndarray) -> np.ndarray:
    """Second hash derived from the 64-bit key (fmix64-style remix)."""
    with np.errstate(over="ignore"):
        k = h ^ (h >> np.uint64(33))
        k = k * _MIX1
        k = k ^ (k >> np.uint64(29))
        k = k * _MIX2
        k = k ^ (k >> np.uint64(32))
    return k | np.uint64(1)  # odd → full-period stride


class ShardedBloom:
    """Bitmaps per shard; add/contains over int64 key arrays."""

    def __init__(self, n_shards: int = 32, bits_per_shard: int = 1 << 20, n_hashes: int = 7):
        self.n_shards = n_shards
        self.m = np.uint64(bits_per_shard)
        self.k = n_hashes
        self.bits = np.zeros((n_shards, bits_per_shard // 8), dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(shard_ids, positions[k, n]) for uint64 keys."""
        u = h.astype(np.int64).view(np.uint64)
        shard = (u % np.uint64(self.n_shards)).astype(np.int64)
        g1 = u % self.m
        g2 = _h2(u) % self.m
        with np.errstate(over="ignore"):
            pos = (g1[None, :] + np.arange(self.k, dtype=np.uint64)[:, None] * g2[None, :]) % self.m
        return shard, pos

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        shard, pos = self._positions(np.asarray(hashes))
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        for i in range(self.k):
            np.bitwise_or.at(self.bits, (shard, byte[i]), bit[i])

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test → bool array (True = *maybe* seen)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        shard, pos = self._positions(np.asarray(hashes))
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        out = np.ones(len(hashes), dtype=bool)
        for i in range(self.k):
            out &= (self.bits[shard, byte[i]] & bit[i]) != 0
        return out

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, bits=self.bits, m=int(self.m), k=self.k, n_shards=self.n_shards
        )

    @classmethod
    def load(cls, path: str) -> "ShardedBloom":
        z = np.load(path)
        b = cls(int(z["n_shards"]), int(z["m"]), int(z["k"]))
        b.bits = z["bits"]
        return b
