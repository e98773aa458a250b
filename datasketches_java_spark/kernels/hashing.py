"""Vectorized seeded 64-bit hashing.

The reference funnels every typed input through one seeded hash
(MurmurHash3 128-bit, reference hash/MurmurHash3.java:68-334, default
seed 9001 at common/Util.java:99) and keeps only `hash[0] >>> 1` — a
uniform 63-bit value (reference theta/UpdatableThetaSketch.java:258).
We keep the same *semantics* (seeded, uniform, 63-bit non-negative so
signed int64 ordering == unsigned ordering) with a vectorized
SplitMix64-style finalizer, which has full 64-bit avalanche and is a
single fused NumPy expression per batch.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)

MAX63 = np.int64(0x7FFFFFFFFFFFFFFF)


def mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer; full avalanche on uint64 arrays."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _MIX1
        x = (x ^ (x >> np.uint64(27))) * _MIX2
        return x ^ (x >> np.uint64(31))


def seed_mix(seed: int) -> np.uint64:
    with np.errstate(over="ignore"):
        return mix64(np.uint64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + _GOLDEN))


def hash64(x: np.ndarray, seed: int = 9001) -> np.ndarray:
    """Seeded 64-bit hash of a uint64 array (vectorized)."""
    x = np.asarray(x, dtype=np.uint64)
    return mix64(x ^ seed_mix(seed))


def hash63(x: np.ndarray, seed: int = 9001) -> np.ndarray:
    """Seeded uniform 63-bit hash, returned as non-negative int64.

    Mirrors the reference's `hash(datum, seed)[0] >>> 1` convention
    (theta/UpdatableThetaSketch.java:258): ordering of the signed view
    equals unsigned ordering, so sorted bottom-k signatures survive the
    int64 round-trip through Spark's LongType.
    """
    return (hash64(x, seed) >> np.uint64(1)).astype(np.int64)


def hash_bytes_batch(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int = 9001
) -> np.ndarray:
    """Seeded 64-bit hash of N variable-length byte strings, vectorized
    across the batch (FNV-1a accumulation + SplitMix64 finalize).

    data  : uint8 array holding all strings concatenated
    starts: int64 array of start offsets (N)
    lens  : int64 array of lengths (N)
    """
    n = len(starts)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return hash64(h, seed)
    max_len = int(lens.max()) if n else 0
    data = np.ascontiguousarray(data, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            active = lens > j
            if not active.any():
                break
            idx = starts[active] + j
            h[active] = (h[active] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    # mix length in so prefixes don't collide with their extensions
    with np.errstate(over="ignore"):
        h = h ^ (lens.astype(np.uint64) * _GOLDEN)
    return hash64(h, seed)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64/int64 array."""
    v = np.asarray(x).astype(np.uint64).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(v, axis=1).sum(axis=1).astype(np.int32)
