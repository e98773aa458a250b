"""Per-cluster sketch audits — the Tuple-sketch-shaped aggregation
(SURVEY.md U1): groupBy(cluster) + a struct of sketch columns.

 - distinct captions per cluster: Spark's built-in hll_sketch_agg /
   hll_sketch_estimate (the same Apache DataSketches HLL algorithm the
   reference implements in hll/HllSketch.java — we delegate, SURVEY §2a H1-H3)
 - distinct shingles per cluster: our KMV union (theta/ThetaUnionImpl
   semantics) merged in applyInPandas — demonstrates the mergeable
   reduce over serialized signatures
 - caption-length quantiles: approx_percentile (audit-grade; the
   reference-exact KLL kernel lives in kernels.kll for unit audits)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN
from ..kernels import kmv

AUDIT_SCHEMA = (
    "cluster_id string, n_rows bigint, distinct_captions_hll double, "
    "kmv_union_est double, kmv_union_lb double, kmv_union_ub double"
)


def cluster_audits(
    spark: SparkSession,
    clusters: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig = FROZEN,
    corpus: DataFrame | None = None,
    min_size: int = 2,
) -> DataFrame:
    """Audit table for clusters with >= min_size members."""
    k = cfg.kmv_k
    members = clusters.filter(F.col("cluster_size") >= min_size).select(
        "image_id", "cluster_id"
    )
    sig = signatures.select("image_id", "kmv_sig", "simhash")
    joined = members.join(sig, "image_id")

    def agg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sigs = [np.asarray(s, np.int64) for s in pdf["kmv_sig"]]
        n = len(pdf)
        u = kmv.union_many(sigs, k)
        lb, est, ub = kmv.estimate_bounds(u, k, 2)
        return pd.DataFrame(
            {
                "cluster_id": [key[0]],
                "n_rows": [n],
                "kmv_union_est": [est],
                "kmv_union_lb": [lb],
                "kmv_union_ub": [ub],
            }
        )

    kmv_part = joined.groupBy("cluster_id").applyInPandas(
        agg,
        "cluster_id string, n_rows bigint, kmv_union_est double, "
        "kmv_union_lb double, kmv_union_ub double",
    )

    out = kmv_part
    if corpus is not None:
        caps = members.join(corpus.select("image_id", "caption"), "image_id")
        hll = caps.groupBy("cluster_id").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("caption", F.lit(12))).alias(
                "distinct_captions_hll"
            ),
            F.expr("approx_percentile(length(caption), array(0.5, 0.99))").alias(
                "caption_len_q"
            ),
        )
        out = out.join(hll, "cluster_id")
    return out
