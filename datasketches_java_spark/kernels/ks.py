"""Kolmogorov-Smirnov test between two KLL sketches (reference X5:
quantilescommon/KolmogorovSmirnov.java:47,156) — the distribution-drift
audit between partitions/time windows."""

from __future__ import annotations

import math

import numpy as np

from .kll import KllDoubles


def ks_delta(a: KllDoubles, b: KllDoubles) -> float:
    """Max |CDF_a - CDF_b| over the union of retained items
    (computeKSDelta analog)."""
    pts = np.unique(
        np.concatenate([a._sorted_view()[0], b._sorted_view()[0]])
    )
    if len(pts) == 0:
        return 0.0
    ca = np.array([a.get_rank(float(p)) for p in pts])
    cb = np.array([b.get_rank(float(p)) for p in pts])
    return float(np.abs(ca - cb).max())


def ks_threshold(a: KllDoubles, b: KllDoubles, p_value: float = 0.05) -> float:
    """Reject threshold: sampling term + both sketches' rank errors
    (kolmogorovSmirnovTest analog)."""
    from .kll import rank_error

    c = math.sqrt(-0.5 * math.log(p_value / 2.0))
    na, nb = max(a.n, 1), max(b.n, 1)
    stat = c * math.sqrt((na + nb) / (na * nb))
    return stat + rank_error(a.k, False) + rank_error(b.k, False)


def ks_test(a: KllDoubles, b: KllDoubles, p_value: float = 0.05) -> bool:
    """True ⇒ evidence the two streams differ in distribution."""
    return ks_delta(a, b) > ks_threshold(a, b, p_value)
