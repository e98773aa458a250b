"""Distributed HLL interop audit — the engine face over
kernels/hll_compat.py.

Spark's built-in ``hll_sketch_agg`` embeds datasketches-java, so this
face closes the loop inside one DataFrame plan:

    JVM builds the sketch  ->  Python re-reads the image and
    re-estimates with the reference estimator chain  ->  Python
    re-serializes  ->  the JVM re-estimates OUR image.

Both re-estimates must equal the JVM's own, which makes the agreement
column a deterministic TRUE per group — an oracle-checkable invariant
(the same trick as the ANN recall gates), while each green row is a
live cross-language wire-format proof, not a tautology.

Scale shape: one hash-partition groupBy (the JVM aggregation), then
per-group O(2^lgK) Arrow-batched Python work on the GROUPED rows
(|groups| rows, not |input| rows) — at 10^12 input rows the Python
stage still touches only the group count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels import hll_compat as hc


@pandas_udf("long")
def _py_estimate(images: pd.Series) -> pd.Series:
    return images.map(lambda b: round(hc.estimate(hc.from_ref_bytes(bytes(b)))))


@pandas_udf("binary")
def _py_rewrite(images: pd.Series) -> pd.Series:
    return images.map(lambda b: hc.to_ref_bytes(hc.from_ref_bytes(bytes(b))))


def hll_interop_audit(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group (group, interop_ok): TRUE iff the Python reader's
    estimate AND the JVM's estimate of the Python-rewritten image both
    equal the JVM's own estimate."""
    sk = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk")
    )
    audited = sk.select(
        group_col,
        F.hll_sketch_estimate("sk").alias("jvm_est"),
        _py_estimate("sk").alias("py_est"),
        F.hll_sketch_estimate(_py_rewrite("sk")).alias("jvm_est_of_py_image"),
    )
    return audited.select(
        group_col,
        (
            (F.col("py_est") == F.col("jvm_est"))
            & (F.col("jvm_est_of_py_image") == F.col("jvm_est"))
        ).alias("interop_ok"),
    ).orderBy(group_col)
