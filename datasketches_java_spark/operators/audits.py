"""Per-cluster sketch audits — the Tuple-sketch-shaped aggregation
(SURVEY.md U1): groupBy(cluster) + a struct of sketch columns.

 - distinct captions per cluster: Spark's built-in hll_sketch_agg /
   hll_sketch_estimate (the same Apache DataSketches HLL algorithm the
   reference implements in hll/HllSketch.java — we delegate, SURVEY §2a H1-H3)
 - distinct shingles per cluster: our KMV union (theta/ThetaUnionImpl
   semantics) merged in applyInPandas — demonstrates the mergeable
   reduce over serialized signatures
 - caption-length quantiles: approx_percentile, emitted as SCALAR p50 /
   p99 columns (audit-grade; the reference-exact KLL kernel lives in
   kernels.kll for unit audits)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN
from ..kernels import kmv

AUDIT_SCHEMA = (
    "cluster_id string, n_rows bigint, kmv_union_est double, "
    "kmv_union_lb double, kmv_union_ub double"
)

_HASH_SPACE_32 = float(2**31)  # pipeline signatures are top-32-bit truncated


def cluster_audits(
    spark: SparkSession,
    clusters: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig = FROZEN,
    corpus: DataFrame | None = None,
    min_size: int = 2,
) -> DataFrame:
    """Audit table for clusters with >= min_size members.

    `clusters` is the boundary table (image_id, cluster_id string);
    `signatures` is the internal table keyed by id64 — the join key is
    re-derived as xxhash64(image_id), the same function the signature
    stage used, so no id map needs to travel."""
    k = cfg.kmv_k
    members = clusters.filter(F.col("cluster_size") >= min_size).select(
        "image_id", F.xxhash64("image_id").alias("id64"), "cluster_id"
    )
    sig = signatures.select("id64", "sig", "simhash")
    joined = members.join(sig, "id64")

    def agg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # sig wire format: little-endian int32 bytes
        sigs = [np.frombuffer(s, dtype="<i4") for s in pdf["sig"]]
        n = len(pdf)
        u = kmv.union_many(sigs, k)
        lb, est, ub = kmv.estimate_bounds(u, k, 2, hash_space=_HASH_SPACE_32)
        return pd.DataFrame(
            {
                "cluster_id": [key[0]],
                "n_rows": [n],
                "kmv_union_est": [est],
                "kmv_union_lb": [lb],
                "kmv_union_ub": [ub],
            }
        )

    kmv_part = joined.groupBy("cluster_id").applyInPandas(agg, AUDIT_SCHEMA)

    out = kmv_part
    if corpus is not None:
        caps = members.join(corpus.select("image_id", "caption"), "image_id")
        hll = caps.groupBy("cluster_id").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("caption", F.lit(12))).alias(
                "distinct_captions_hll"
            ),
            # the exact twin every estimate column is audited against
            # (clusters are small; at web scale this column is dropped
            # and the HLL/KMV estimates carry the audit)
            F.countDistinct("caption").alias("distinct_captions_exact"),
            # exact interpolated percentiles (floor → deterministic int;
            # matches DuckDB quantile_cont + floor in the gate oracle)
            F.expr("percentile(length(caption), array(0.5, 0.99))").alias("_q"),
        ).select(
            "cluster_id",
            "distinct_captions_hll",
            "distinct_captions_exact",
            F.floor(F.col("_q")[0]).cast("int").alias("caption_len_p50"),
            F.floor(F.col("_q")[1]).cast("int").alias("caption_len_p99"),
        )
        out = out.join(hll, "cluster_id")
    return out
