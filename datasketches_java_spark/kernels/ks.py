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


def ks_delta_rational(a: KllDoubles, b: KllDoubles) -> tuple[int, int]:
    """(num, den) with D = num/den as an exact rational: den = n_a·n_b,
    num = max over union support of |cum_a(v)·n_b − cum_b(v)·n_a| with
    cum = inclusive cumulative retained weight (#items ≤ v by weight).

    KLL retained weights are integer powers of two, so this is exact
    integer math over the sketch state; when both sketches are in
    their exact regime (no compaction) it equals the true two-sample
    D-statistic — which makes it SQL-oracle-able with no float-CDF
    divergence (gate query ks_caption_len_sources)."""
    ia, wa = a._sorted_view()
    ib, wb = b._sorted_view()
    pts = np.unique(np.concatenate([ia, ib]))
    if len(pts) == 0:
        return 0, 1
    ca = np.concatenate([[0], np.cumsum(wa)])[
        np.searchsorted(ia, pts, side="right")
    ]
    cb = np.concatenate([[0], np.cumsum(wb)])[
        np.searchsorted(ib, pts, side="right")
    ]
    na, nb = int(a.n), int(b.n)
    num = int(np.abs(ca.astype(object) * nb - cb.astype(object) * na).max())
    return num, na * nb


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
