"""Frequent-items (Misra-Gries) and KS-test kernel tests vs exact."""

import numpy as np
import pytest

from datasketches_java_spark.kernels.freq import (
    NO_FALSE_NEGATIVES,
    NO_FALSE_POSITIVES,
    FrequentItems,
)
from datasketches_java_spark.kernels.kll import KllDoubles
from datasketches_java_spark.kernels.ks import ks_delta, ks_test


def _zipf_stream(n, n_items, seed):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n_items + 1) ** 1.3
    return rng.choice(n_items, n, p=w / w.sum())


def test_mg_error_bound_and_heavy_hitters():
    stream = _zipf_stream(50_000, 5_000, 0)
    sk = FrequentItems(64).update_many(stream.tolist())
    exact = {}
    for x in stream:
        exact[x] = exact.get(x, 0) + 1
    assert sk.max_error() <= len(stream) // 64 + 1  # ε·n bound
    # every estimate within [exact - 0, exact + max_error] style bounds
    for item, lb, ub in sk.frequent_items(0, NO_FALSE_NEGATIVES)[:50]:
        assert lb <= exact.get(item, 0) <= ub
    # true heavy hitters above 2·max_error must be found (no false negatives)
    thresh = 2 * sk.max_error() + 1
    found = {i for i, _, _ in sk.frequent_items(thresh, NO_FALSE_NEGATIVES)}
    for item, c in exact.items():
        if c >= thresh:
            assert item in found, (item, c, thresh)
    # NO_FALSE_POSITIVES: every returned item truly above its lb
    for item, lb, ub in sk.frequent_items(thresh, NO_FALSE_POSITIVES):
        assert exact.get(item, 0) >= lb


def test_mg_merge():
    s1 = FrequentItems(64).update_many(_zipf_stream(20_000, 1000, 1).tolist())
    s2 = FrequentItems(64).update_many(_zipf_stream(20_000, 1000, 2).tolist())
    merged = FrequentItems(64).merge(s1).merge(s2)
    assert merged.n == 40_000
    assert merged.max_error() <= 40_000 // 64 + 2


def test_ks_same_vs_different():
    rng = np.random.default_rng(3)
    a = KllDoubles(200).update_many(rng.normal(0, 1, 30_000))
    b = KllDoubles(200).update_many(rng.normal(0, 1, 30_000))
    c = KllDoubles(200).update_many(rng.normal(1.0, 1, 30_000))
    assert not ks_test(a, b, 0.05)
    assert ks_test(a, c, 0.05)
    assert ks_delta(a, c) > ks_delta(a, b)
