"""EBPPS kernel vs the reference contract
(sampling/EbppsItemsSketch.java:45-49): presence proportional to
weight (capped), realized size within one of the budget, heavy items
certain, unbiased Horvitz-Thompson subset sums."""

import numpy as np
import pytest

from datasketches_java_spark.kernels.ebpps import (
    _ebpps_threshold, ebpps_sample, inclusion_probs,
)


def test_passthrough_small_population():
    items = np.arange(10)
    w = np.linspace(1, 10, 10)
    s, tau = ebpps_sample(items, w, k=32)
    assert np.array_equal(s, items) and tau == 0.0


def test_sample_size_within_one_of_budget():
    rng = np.random.default_rng(2)
    n, k = 5000, 48
    w = rng.pareto(1.5, n) + 0.1
    for seed in range(20):
        s, tau = ebpps_sample(np.arange(n), w, k, seed=seed * 31 + 1)
        assert k - 1 <= len(s) <= k + 1, len(s)


def test_heavy_items_always_present():
    rng = np.random.default_rng(5)
    n, k = 3000, 64
    w = rng.exponential(1.0, n) + 0.01
    w[7] = w.sum()  # one overwhelming item
    tau, _ = _ebpps_threshold(w, float(k))
    heavies = np.nonzero(w > tau)[0]
    for seed in range(10):
        s, _t = ebpps_sample(np.arange(n), w, k, seed=seed * 101 + 3)
        for h in heavies:
            assert h in s


def test_inclusion_proportional_to_weight():
    """Empirical inclusion frequency over seeds ≈ min(1, w/tau)."""
    rng = np.random.default_rng(9)
    n, k = 800, 96
    w = rng.gamma(2.0, 2.0, n) + 0.05
    items = np.arange(n)
    tau, _ = _ebpps_threshold(w, float(k))
    pi = inclusion_probs(w, tau)
    trials = 300
    hits = np.zeros(n)
    for seed in range(trials):
        s, _t = ebpps_sample(items, w, k, seed=seed * 7919 + 13)
        hits[s] += 1
    emp = hits / trials
    # 4-sigma binomial envelope per item, checked in aggregate
    sd = np.sqrt(pi * (1 - pi) / trials)
    bad = np.abs(emp - pi) > 4 * sd + 0.02
    assert bad.mean() < 0.01, f"{bad.sum()} items out of envelope"


def test_ht_subset_sum_unbiased():
    rng = np.random.default_rng(17)
    n, k = 2000, 128
    w = rng.exponential(2.0, n) + 0.05
    items = np.arange(n)
    subset = items % 3 == 0
    true = w[subset].sum()
    ests = []
    for seed in range(200):
        s, tau = ebpps_sample(items, w, k, seed=seed * 104729 + 7)
        pi = inclusion_probs(w[s], tau)
        m = (s % 3) == 0
        ests.append((w[s][m] / pi[m]).sum())
    se = np.std(ests) / np.sqrt(len(ests))
    assert abs(np.mean(ests) - true) <= 3 * se + 1e-9
