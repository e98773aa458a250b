"""FDT (Frequent Distinct Tuples) — kernel semantics, distributed
face, and the exact BinomialBoundsN transcription it leans on.
Reference: fdt/FdtSketch.java, fdt/PostProcessor.java, fdt/Group.java,
thetacommon/BinomialBoundsN.java (live bit-equality is in
tests/test_live_jvm_interop.py)."""

import math

import numpy as np
import pytest

from datasketches_java_spark.kernels import fdt as FDT
from datasketches_java_spark.kernels.bounds import (
    ref_binomial_lower_bound,
    ref_binomial_upper_bound,
)

_LONG_MAX = (1 << 63) - 1


def test_compute_lgk_formula():
    # FdtSketch.computeLgK: ceil(log2(ceil(1/(threshold*rse^2))))
    assert FDT.compute_lgk(0.01, 0.05) == math.ceil(
        math.log2(math.ceil(1.0 / (0.01 * 0.05 * 0.05))))
    assert FDT.compute_lgk(0.5, 0.5) == 3
    with pytest.raises(ValueError):
        FDT.compute_lgk(1e-9, 0.001)  # > 2^26


def test_post_process_exact_regime():
    pri = np.array(["a", "b", "a", "c", "a", "b"], dtype=object)
    out = FDT.post_process(pri, _LONG_MAX, 2)
    assert list(out.pri_key) == ["a", "b", "c"]  # count desc, key asc
    assert list(out.grp_count) == [3, 2, 1]
    assert (out.est == out.grp_count).all()
    assert (out.lb == out.grp_count).all()
    assert (out.ub == out.grp_count).all()
    assert (out.rse == 0.0).all()
    assert np.allclose(out.fraction, [3 / 6, 2 / 6, 1 / 6])


def test_post_process_estimating_regime():
    theta_long = _LONG_MAX // 2  # theta = 0.5
    pri = np.array(["x"] * 40 + ["y"] * 10, dtype=object)
    out = FDT.post_process(pri, theta_long, 2)
    theta = theta_long / _LONG_MAX
    assert out.est.iloc[0] == 40 / theta
    # bounds bracket the estimate and match the reference transcription
    assert out.lb.iloc[0] == ref_binomial_lower_bound(40, theta, 2)
    assert out.ub.iloc[0] == ref_binomial_upper_bound(40, theta, 2)
    assert out.lb.iloc[0] <= out.est.iloc[0] <= out.ub.iloc[0]
    assert out.rse.iloc[0] == (
        ref_binomial_upper_bound(40, theta, 1) / out.est.iloc[0]) - 1.0


def test_post_process_limit_and_numsdev_validation():
    pri = np.array(["a", "b", "a"], dtype=object)
    out = FDT.post_process(pri, _LONG_MAX, 2, limit=1)
    assert len(out) == 1 and out.pri_key.iloc[0] == "a"
    with pytest.raises(ValueError):
        FDT.post_process(pri, _LONG_MAX, 5)


def test_binomial_bounds_branches():
    # every branch of the BinomialBoundsN transcription behaves sanely
    for n, th, sd in [
        (0, 0.3, 2),      # ub log-branch, lb 0
        (1, 0.2, 1),      # lb single-sample log branch
        (7, 0.9999999, 2),  # theta ~ 1 short-circuit
        (50, 0.01, 3),    # equiv-table branch (theta < n/360)
        (60, 0.5, 2),     # special nstar/nprime exact branch
        (500, 0.37, 2),   # gaussian branch (n > 120)
    ]:
        lb = ref_binomial_lower_bound(n, th, sd)
        ub = ref_binomial_upper_bound(n, th, sd)
        est = n / th
        assert lb <= est <= ub
        assert lb >= 0
    with pytest.raises(ValueError):
        ref_binomial_lower_bound(5, 0.5, 4)
    with pytest.raises(ValueError):
        ref_binomial_upper_bound(5, 1.5, 2)


def test_extract_pri_keys():
    t = np.array([["en", "s1", "doc"], ["de", "s2", "x"]], dtype=object)
    assert list(FDT.extract_pri_keys(t, [0, 1])) == ["en,s1", "de,s2"]
    assert list(FDT.extract_pri_keys(t, [2])) == ["doc", "x"]


def test_fdt_estimating_accuracy_unbiased():
    # sketch-regime estimate lands inside the reference's own 2-sdev
    # bounds and near truth: 20k distinct tuples, k=1024
    rng = np.random.default_rng(11)
    n_pri, per = 100, 200
    # uniform 63-bit hashes (collision odds ~1e-11 at this size)
    hashes = np.unique(
        rng.integers(1, (1 << 63) - 1, size=n_pri * per, dtype=np.int64))
    assert len(hashes) == n_pri * per
    k = 1024
    theta_long = int(hashes[k])
    retained = hashes[:k]
    pri = np.array([f"p{h % n_pri}" for h in retained], dtype=object)
    out = FDT.post_process(pri, theta_long, 2)
    # total estimate across groups ~ total distinct tuples
    assert abs(out.est.sum() - n_pri * per) / (n_pri * per) < 0.15
    assert (out.lb <= out.est).all() and (out.est <= out.ub).all()


def test_fdt_distributed_face_matches_single_pass(spark):
    """The two-level face must equal a single-pass sketch build on the
    same rows (merge invariance) — exact regime over a small frame."""
    import pandas as pd

    from datasketches_java_spark.functions.fdt_agg import fdt_group_list

    rng = np.random.default_rng(5)
    rows = pd.DataFrame({
        "a": [f"k{i % 13}" for i in range(400)],
        "b": [f"u{rng.integers(0, 37)}" for _ in range(400)],
    })
    df = spark.createDataFrame(rows).repartition(7)
    got = fdt_group_list(df, ["a", "b"], [0], lgk=12).toPandas()
    got = got.sort_values(["grp_count", "pri_key"],
                          ascending=[False, True]).reset_index(drop=True)
    truth = rows.drop_duplicates().groupby("a").size()
    assert dict(zip(got.pri_key, got.grp_count)) == dict(truth)
    assert (got.est == got.grp_count).all()
    assert (got.rse == 0.0).all()


def test_fdt_face_empty_input(spark):
    from datasketches_java_spark.functions.fdt_agg import fdt_group_list

    df = spark.createDataFrame([], "a string, b string")
    assert fdt_group_list(df, ["a", "b"], [0], lgk=6).count() == 0


def test_post_process_matches_bruteforce_property():
    """Property: for random retained samples and thetas, post_process
    equals a brute-force pandas groupby with the reference formulas."""
    import pandas as pd

    rng = np.random.default_rng(23)
    for trial in range(25):
        n = int(rng.integers(1, 400))
        pri = np.array([f"k{v}" for v in rng.integers(0, 20, n)], dtype=object)
        estimating = bool(rng.integers(0, 2))
        theta_long = int(rng.integers(_LONG_MAX // 100, _LONG_MAX)) if estimating else _LONG_MAX
        sd = int(rng.integers(1, 4))
        out = FDT.post_process(pri, theta_long, sd)
        theta = theta_long / _LONG_MAX
        truth = pd.Series(pri).value_counts()
        assert len(out) == len(truth)
        for r in out.itertuples():
            c = truth[r.pri_key]
            assert r.grp_count == c
            exp_est = (c / theta) if theta_long < _LONG_MAX else float(c)
            assert r.est == exp_est
            assert r.lb == ref_binomial_lower_bound(c, theta, sd)
            assert r.ub == ref_binomial_upper_bound(c, theta, sd)
            assert r.fraction == c / len(pri)
        # ordering: counts non-increasing, key asc within equal counts
        cc = out.grp_count.to_numpy()
        assert (np.diff(cc) <= 0).all()


def test_extract_pri_keys_empty_and_validation():
    # empty retained sample (empty sketch image) -> empty keys
    out = FDT.extract_pri_keys(np.array([], dtype=object), [0, 2])
    assert len(out) == 0
    # and post_process over it yields an empty group list
    assert len(FDT.post_process(out, _LONG_MAX, 2)) == 0
    with pytest.raises(ValueError):
        FDT.extract_pri_keys(np.array([["a", "b"]], dtype=object), [])
