"""INCLUSIVE vs EXCLUSIVE search criteria across the quantile families
(quantilescommon/QuantileSearchCriteria.java:41,59): brute-force
semantics on the shared view search, and LIVE parity — a JVM-built
sketch image is parsed and must answer getQuantile/getRank identically
to datasketches-java under BOTH criteria, in the estimating regime
(same state, so this checks the search semantics, not the sketch)."""

import numpy as np
import pytest

from datasketches_java_spark.kernels.kll import from_ref_bytes as kll_from_ref_bytes
from datasketches_java_spark.kernels.quantile_search import (
    quantile_from_view,
    rank_from_view,
)


def _brute_view(values):
    s = np.sort(np.asarray(values, np.float64))
    return s, np.arange(1, len(s) + 1, dtype=np.int64)


def test_exclusive_vs_brute_force_with_duplicates():
    vals = [1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 5.0, 9.0]
    it, cum = _brute_view(vals)
    n = len(vals)
    s = np.sort(np.asarray(vals))
    for rank in (0.0, 0.1, 0.25, 0.5, 0.375, 0.75, 0.99, 1.0):
        # INCLUSIVE: smallest item with #(<= item) >= ceil(rank*n)
        nat_i = int(np.ceil(round(rank * n, 7)))
        exp_i = s[max(nat_i - 1, 0)]
        assert quantile_from_view(it, cum, n, rank, True) == exp_i
        # EXCLUSIVE: smallest item with #(<= item) > floor(rank*n)
        nat_e = int(np.floor(round(rank * n, 7)))
        exp_e = s[min(nat_e, n - 1)]
        assert quantile_from_view(it, cum, n, rank, False) == exp_e
    for v in (0.5, 1.0, 2.0, 4.0, 5.0, 9.0, 10.0):
        assert rank_from_view(it, cum, n, v, True) == np.mean(s <= v)
        assert rank_from_view(it, cum, n, v, False) == np.mean(s < v)


def test_kll_doubles_live_parity_both_criteria(spark):
    jvm = spark._jvm
    jk = jvm.org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    rng = np.random.default_rng(5)
    vals = rng.normal(0.0, 100.0, 50_000)
    for v in vals:  # estimating regime: state far beyond k
        jk.update(float(v))
    mine = kll_from_ref_bytes(bytes(jk.toByteArray()))
    EX = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.EXCLUSIVE
    IN = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    for r in (0.0, 0.001, 0.25, 0.5, 0.75, 0.999, 1.0):
        assert mine.get_quantile(r, inclusive=True) == jk.getQuantile(float(r), IN)
        assert mine.get_quantile(r, inclusive=False) == jk.getQuantile(float(r), EX)
    for v in (-250.0, -50.0, 0.0, 50.0, 250.0):
        assert mine.get_rank(v, inclusive=True) == pytest.approx(
            jk.getRank(float(v), IN), abs=0
        )
        assert mine.get_rank(v, inclusive=False) == pytest.approx(
            jk.getRank(float(v), EX), abs=0
        )


def test_kll_items_live_parity_both_criteria(spark):
    from datasketches_java_spark.kernels.kll_items import KllItems

    jvm = spark._jvm
    cmp_ = jvm.java.util.Comparator.naturalOrder()
    serde = jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    jki = jvm.org.apache.datasketches.kll.KllItemsSketch.newHeapInstance(cmp_, serde)
    rng = np.random.default_rng(9)
    for v in rng.integers(0, 10**6, 20_000):
        jki.update(f"{v:07d}")
    mine = KllItems.from_ref_bytes(bytes(jki.toByteArray()))
    EX = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.EXCLUSIVE
    IN = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    for r in (0.0, 0.2, 0.5, 0.8, 1.0):
        assert mine.get_quantile(r, inclusive=True) == jki.getQuantile(float(r), IN)
        assert mine.get_quantile(r, inclusive=False) == jki.getQuantile(float(r), EX)
    for w in ("0100000", "0500000", "0900000"):
        assert mine.get_rank(w, inclusive=True) == jki.getRank(w, IN)
        assert mine.get_rank(w, inclusive=False) == jki.getRank(w, EX)


def test_req_live_parity_both_criteria(spark):
    from datasketches_java_spark.kernels.req import from_ref_bytes

    jvm = spark._jvm
    bld = jvm.org.apache.datasketches.req.ReqSketchBuilder()
    jr = bld.build()
    rng = np.random.default_rng(13)
    vals = rng.uniform(0.0, 1000.0, 30_000).astype(np.float32)
    for v in vals:
        jr.update(float(v))
    mine = from_ref_bytes(bytes(jr.toByteArray()))
    EX = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.EXCLUSIVE
    IN = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    f32 = np.float32
    for r in (0.0, 0.1, 0.5, 0.9, 1.0):
        # REQ is a float32 sketch; py4j widens Java floats — compare at f32
        assert f32(mine.get_quantile(r, inclusive=True)) == f32(jr.getQuantile(float(r), IN))
        assert f32(mine.get_quantile(r, inclusive=False)) == f32(jr.getQuantile(float(r), EX))
    for v in (10.0, 500.0, 990.0):
        vq = float(f32(v))
        assert mine.get_rank(vq, inclusive=True) == jr.getRank(vq, IN)
        assert mine.get_rank(vq, inclusive=False) == jr.getRank(vq, EX)
