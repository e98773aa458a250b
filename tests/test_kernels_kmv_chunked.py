"""The cache-resident chunked evaluation of jaccard_bounds_flat must
be BIT-IDENTICAL to the one-shot flat kernel — every operation in the
flat kernel is per-pair-local, so slicing by pairs cannot change any
output. Fixtures cover saturated/unsaturated/ragged/empty sides and
shared values (the dup-within-pair branch)."""

import numpy as np

from datasketches_java_spark.kernels import kmv


def _ragged(rng, n, lo, hi, k):
    lens = rng.integers(lo, hi + 1, n)
    lens[rng.integers(0, n, max(1, n // 17))] = 0  # empty sides
    vals = [
        np.sort(rng.integers(0, 2**31, l, dtype=np.int64))[:k].astype(np.int32)
        for l in lens
    ]
    flat = (
        np.concatenate(vals) if any(len(v) for v in vals)
        else np.empty(0, np.int32)
    )
    return flat, np.fromiter((len(v) for v in vals), np.int64, n)


def test_chunked_bit_identical_to_flat():
    rng = np.random.default_rng(13)
    k = 64
    n = 5000
    va, la = _ragged(rng, n, 0, 120, k)
    vb, lb = _ragged(rng, n, 0, 120, k)
    ref = kmv.jaccard_bounds_flat(va, la, vb, lb, k, 2.0)
    for target in (256, 1024, 1 << 16):
        got = kmv.jaccard_bounds_flat_chunked(
            va, la, vb, lb, k, 2.0, target_vals=target
        )
        for r, g in zip(ref, got):
            assert np.array_equal(r, g, equal_nan=True)


def test_chunked_shared_values_and_duplicates():
    rng = np.random.default_rng(5)
    k = 32
    n = 800
    # draw from a SMALL value universe so pairs share values and the
    # dup-within-pair branch fires constantly
    lens_a = rng.integers(1, 50, n)
    lens_b = rng.integers(1, 50, n)
    va = np.concatenate(
        [np.sort(rng.integers(0, 500, l, dtype=np.int64)).astype(np.int32)
         for l in lens_a])
    vb = np.concatenate(
        [np.sort(rng.integers(0, 500, l, dtype=np.int64)).astype(np.int32)
         for l in lens_b])
    ref = kmv.jaccard_bounds_flat(va, lens_a, vb, lens_b, k, 2.0)
    got = kmv.jaccard_bounds_flat_chunked(
        va, lens_a, vb, lens_b, k, 2.0, target_vals=128
    )
    for r, g in zip(ref, got):
        assert np.array_equal(r, g, equal_nan=True)


def test_chunked_empty_input():
    e32 = np.empty(0, np.int32)
    e = np.empty(0, np.int64)
    lo, f, hi = kmv.jaccard_bounds_flat_chunked(e32, e, e32, e, 16, 2.0)
    assert len(lo) == len(f) == len(hi) == 0
