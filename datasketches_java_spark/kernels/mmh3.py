"""MurmurHash3 x64-128 — byte-exact with the reference's hash lane.

The reference funnels every typed update through one 128-bit
MurmurHash3 (hash/MurmurHash3.java:68, seed default 9001 at
common/Util.java:99); its cross-language serialized images embed a
16-bit seed hash derived from it (common/Util.java:967
computeSeedHash). This module implements the same public-domain
algorithm (Austin Appleby, MurmurHash3 C++ v150 — the version the
reference's own known-answer tests cite,
test hash/MurmurHash3Test.java:34) so our serialized sketches carry
reference-valid seed hashes and our interop lane produces the exact
hash stream Java produces for the same input.

Two faces:
 - `mmh3_128(data, seed)` — scalar, arbitrary byte strings (preamble
   fields, golden-fixture construction; not a hot path).
 - `mmh3_128_longs(keys, seed)` — vectorized over an int64/uint64
   column: each element hashed as one 8-byte little-endian key,
   matching Java's `update(long)` → `hash(long, seed)` exactly. This
   is the reference-compatible *update lane* for sketches that must
   interop byte-for-byte.

The pipeline's internal 31-bit lane (kernels/hashing.py) remains the
default — it is faster and its downstream shuffles are narrower; the
mmh3 lane exists for wire-format interop.
"""

from __future__ import annotations

import struct

import numpy as np

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def mmh3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """128-bit MurmurHash3 of a byte string → (h1, h2) as uint64 ints."""
    h1 = h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
    if k2:
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if k1:
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def _fmix_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> np.uint64(33))


def mmh3_128_longs(keys: np.ndarray, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized hash of each element as one 8-byte LE key — the
    exact stream of Java's hash(long, seed) (MurmurHash3.java:81).
    Returns (h1, h2) uint64 arrays."""
    k1 = np.asarray(keys).astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h1 = np.full(len(k1), seed & _M64, dtype=np.uint64)
        h2 = h1.copy()
        # tail mix of the single 8-byte block (k2 absent)
        t = k1 * np.uint64(_C1)
        t = (t << np.uint64(31)) | (t >> np.uint64(33))
        t = t * np.uint64(_C2)
        h1 = h1 ^ t
        n = np.uint64(8)
        h1 = h1 ^ n
        h2 = h2 ^ n
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix_vec(h1)
        h2 = _fmix_vec(h2)
        h1 = h1 + h2
        h2 = h2 + h1
    return h1, h2


def compute_seed_hash(seed: int) -> int:
    """16-bit seed hash stored in every preamble (common/Util.java:967):
    mmh3(seed as one long, seed=0)[0] & 0xFFFF; zero is illegal."""
    h1, _ = mmh3_128(struct.pack("<q", seed), 0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} produces a zero seed hash")
    return sh
