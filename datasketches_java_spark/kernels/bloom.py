"""Bloom filter — vectorized NumPy kernel (reference
filters/bloomfilter/BloomFilter.java, builder sizing formulas
filters/bloomfilter/BloomFilterBuilder.java:50-142).

Semantics mirror the reference: an m-bit array, h hash functions per
item, `update` sets bits, `query` tests them (no false negatives,
false-positive probability ~(1-e^{-hn/m})^h), `union`/`intersect` are
bitwise OR/AND of filters with identical (m, h, seed)
(BloomFilter.java:681,695). The reference applies XxHash64 with an
incremented seed per hash index (BloomFilter.java:388-499); we derive
the h probe positions by Kirsch–Mitzenmacher double hashing from one
seeded 64-bit hash — the standard construction with the same FPP
guarantees — and vectorize updates/queries across NumPy batches.

At Spark scale the same shape is available JVM-side via
`bloom_filter_agg` / `might_contain` (used by the gate query as the
shuffle-reduction prefilter); this kernel is the audited reference
implementation with builder-formula tests.
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash64


def suggest_num_hashes_from_size(max_distinct: int, num_bits: int) -> int:
    """BloomFilterBuilder.suggestNumHashes(maxDistinctItems, numFilterBits)
    (BloomFilterBuilder.java:50-55): ceil((m/n)·ln2), min 1."""
    return max(1, math.ceil((num_bits / max_distinct) * math.log(2.0)))


def suggest_num_hashes(target_fpp: float) -> int:
    """BloomFilterBuilder.suggestNumHashes(targetFalsePositiveProb)
    (BloomFilterBuilder.java:63-68): ceil(-log2(p))."""
    if not (0.0 < target_fpp <= 1.0):
        raise ValueError("target FPP must be in (0, 1]")
    return math.ceil(-math.log(target_fpp) / math.log(2.0))


def suggest_num_filter_bits(max_distinct: int, target_fpp: float) -> int:
    """BloomFilterBuilder.suggestNumFilterBits (BloomFilterBuilder.java:78-80):
    ceil(-n·ln(p) / ln(2)²)."""
    if max_distinct <= 0:
        raise ValueError("maxDistinctItems must be positive")
    return math.ceil((-max_distinct * math.log(target_fpp)) / (math.log(2.0) ** 2))


class BloomFilter:
    """Heap Bloom filter over 64-bit items (hash them first for other
    types, as the reference's typed update() overloads do)."""

    def __init__(self, num_bits: int, num_hashes: int, seed: int = 9001):
        if num_bits <= 0 or num_hashes <= 0:
            raise ValueError("num_bits and num_hashes must be positive")
        self.m = int(num_bits)
        self.h = int(num_hashes)
        self.seed = seed
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_updates = 0

    @classmethod
    def create(cls, max_distinct: int, target_fpp: float, seed: int = 9001
               ) -> "BloomFilter":
        m = suggest_num_filter_bits(max_distinct, target_fpp)
        h = suggest_num_hashes_from_size(max_distinct, m)
        return cls(m, h, seed)

    def _positions(self, items: np.ndarray) -> np.ndarray:
        """(n, h) bit positions via double hashing h1 + i·h2 mod m."""
        x = np.asarray(items, dtype=np.uint64)
        h1 = hash64(x, self.seed)
        h2 = hash64(x, self.seed + 0x9E3779B9) | np.uint64(1)  # odd stride
        i = np.arange(self.h, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i[None, :] * h2[:, None])
                    % np.uint64(self.m)).astype(np.int64)

    def update(self, items: np.ndarray) -> None:
        pos = self._positions(items).reshape(-1)
        np.bitwise_or.at(
            self.bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        )
        self.n_updates += len(np.atleast_1d(items))

    def query(self, items: np.ndarray) -> np.ndarray:
        """bool[n] — False is definite (no false negatives)."""
        pos = self._positions(items)
        word = self.bits[pos >> 6]
        bit = (word >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=1)

    def union(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        out = BloomFilter(self.m, self.h, self.seed)
        out.bits = self.bits | other.bits
        out.n_updates = self.n_updates + other.n_updates
        return out

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        out = BloomFilter(self.m, self.h, self.seed)
        out.bits = self.bits & other.bits
        return out

    def _check_compat(self, other: "BloomFilter") -> None:
        if (self.m, self.h, self.seed) != (other.m, other.h, other.seed):
            raise ValueError("incompatible Bloom filters (m, h, seed must match)")

    @property
    def bits_set(self) -> int:
        return int(np.unpackbits(self.bits.view(np.uint8)).sum())

    def expected_fpp(self) -> float:
        """(fraction of set bits)^h — the standard occupancy-based FPP."""
        return (self.bits_set / self.m) ** self.h

    def serialize(self) -> bytes:
        header = np.array([0x424C4D31, 1, self.m, self.h, self.seed,
                           self.n_updates], dtype="<u8")
        return header.tobytes() + self.bits.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, buf: bytes) -> "BloomFilter":
        head = np.frombuffer(buf[:48], dtype="<u8")
        if head[0] != 0x424C4D31 or head[1] != 1:
            raise ValueError("bad Bloom filter image")
        bf = cls(int(head[2]), int(head[3]), int(head[4]))
        bf.n_updates = int(head[5])
        bf.bits = np.frombuffer(buf[48:], dtype="<u8").astype(np.uint64)
        return bf
