"""Distributed theta + KLL interop audit — the engine face over
kernels/theta_compat.py and kernels/kll.py, the same closed-loop
cross-language trick as functions/hll_interop.py.

Spark 4.1's built-in ``theta_sketch_agg`` / ``kll_sketch_agg_double``
embed datasketches-java, so one DataFrame plan proves the wire formats
live, distributed, against the actual Java library:

    JVM builds the sketch image per group
      -> theta: Spark emits the serial-v4 COMPRESSED compact form
         (observed: preLongs=1 serVer=4 family=3), so the Python read
         leg exercises the round-5 v4 bit-packed reader; the rewrite
         leg re-serializes as serial-v3 ordered compact — a cross-FORM
         migration the JVM must re-read with the identical estimate
      -> KLL: Python reads the KllDoublesSketch image
         (kll/KllPreambleUtil.java layout), answers quantiles with the
         reference sorted-view rule, re-serializes; the JVM re-reads

Per group the audit column is TRUE iff every leg agrees exactly —
a deterministic invariant a SQL oracle can assert (the ANN-recall-gate
trick), while each green row is a live wire-format proof.

Scale shape: one hash-partition groupBy (the JVM aggregation), then
per-group O(k) Arrow-batched Python work on the GROUPED rows — at
10^12 input rows the Python stage touches |groups| rows only.

Reference: theta/PreambleUtil.java (v3/v4 layouts),
kll/KllPreambleUtil.java; estimate rule ThetaSketch.getEstimate
(retained / theta), Spark's long estimate is Math.round = floor(x+0.5).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels import kll as K
from ..kernels import theta_compat as tc

_QS = (0.25, 0.5, 0.75, 0.99)


@pandas_udf("long")
def _py_theta_estimate(images: pd.Series) -> pd.Series:
    def est(b: bytes) -> int:
        h, th, _ = tc.deserialize_compact(bytes(b))
        return int(math.floor(tc.estimate(len(h), th) + 0.5))  # Math.round

    return images.map(est)


@pandas_udf("binary")
def _py_theta_rewrite(images: pd.Series) -> pd.Series:
    def rw(b: bytes) -> bytes:
        h, th, _ = tc.deserialize_compact(bytes(b))
        return tc.serialize_compact(h, th)

    return images.map(rw)


@pandas_udf("array<double>")
def _py_kll_quantiles(images: pd.Series) -> pd.Series:
    def qs(b: bytes) -> list:
        sk = K.from_ref_bytes(bytes(b))
        return [sk.get_quantile(q) for q in _QS]

    return images.map(qs)


@pandas_udf("binary")
def _py_kll_rewrite(images: pd.Series) -> pd.Series:
    return images.map(lambda b: K.to_ref_bytes(K.from_ref_bytes(bytes(b))))


def _jvm_kll_quantiles(col):
    """col: name or Column holding a KllDoublesSketch image."""
    return F.array(
        *[F.kll_sketch_get_quantile_double(col, F.lit(q)) for q in _QS]
    )


def theta_kll_interop_audit(
    df: DataFrame,
    group_col: str,
    theta_col: str,
    kll_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group (group, theta_ok, kll_ok):

    theta_ok — the Python reader's Math-round estimate of the JVM's
    serial-v4 compressed image AND the JVM's estimate of the Python
    serial-v3 rewrite both equal the JVM's own estimate.
    kll_ok — the Python sorted-view quantiles at 25/50/75/99% AND the
    JVM's quantiles of the Python-rewritten image are bit-equal to the
    JVM's own.
    """
    sk = df.groupBy(group_col).agg(
        F.theta_sketch_agg(theta_col, F.lit(lg_k)).alias("th"),
        F.kll_sketch_agg_double(kll_col).alias("kll"),
    )
    audited = sk.select(
        group_col,
        F.theta_sketch_estimate("th").alias("jvm_est"),
        _py_theta_estimate("th").alias("py_est"),
        F.theta_sketch_estimate(_py_theta_rewrite("th")).alias("jvm_est_rw"),
        _jvm_kll_quantiles("kll").alias("jvm_qs"),
        _py_kll_quantiles("kll").alias("py_qs"),
        _jvm_kll_quantiles(_py_kll_rewrite("kll")).alias("jvm_qs_rw"),
    )
    return audited.select(
        group_col,
        (
            (F.col("py_est") == F.col("jvm_est"))
            & (F.col("jvm_est_rw") == F.col("jvm_est"))
        ).alias("theta_ok"),
        (
            (F.col("py_qs") == F.col("jvm_qs"))
            & (F.col("jvm_qs_rw") == F.col("jvm_qs"))
        ).alias("kll_ok"),
    ).orderBy(group_col)
