"""Per-cluster sketch audits — the Tuple-sketch-shaped aggregation
(SURVEY.md U1): groupBy(cluster) + a struct of sketch columns.

 - distinct captions per cluster: Spark's built-in hll_sketch_agg /
   hll_sketch_estimate (the same Apache DataSketches HLL algorithm the
   reference implements in hll/HllSketch.java — we delegate, SURVEY §2a H1-H3)
 - distinct shingles per cluster: our KMV union (theta/ThetaUnionImpl
   semantics) as a TWO-LEVEL partial/final aggregation — each Arrow
   batch collapses its clusters to one serialized sketch (map-side
   combine), the grouped final stage unions sketches; per-task state is
   O(k) per cluster no matter how large the cluster
   (sampling/VarOptItemsUnion.java:205 and ThetaUnionImpl.java:272-303
   are the reference precedents for this split)
 - caption-length quantiles: the KLL sketch UDAF (kernels/kll.py via
   functions/kll_agg.py), discrete inclusive quantiles with integer
   rank fractions — exact when cluster size <= k (the gate regime),
   rank-error-bounded 2.446/k^0.9433 beyond (kll/KllHelper.java:295-299)
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
    idmap: DataFrame | None = None,
) -> DataFrame:
    """Audit table for clusters with >= min_size members.

    `clusters` is the boundary table (image_id, cluster_id string);
    `signatures` is the internal table keyed by id64. With the default
    keying the join key is re-derived as xxhash64(image_id) — the same
    function the signature stage used, so no id map needs to travel;
    pipelines running id_remap/id_key MUST pass their `idmap`
    (id64, image_id) instead, or remapped rows would silently drop out
    of the audit join (run_pipeline does)."""
    k = cfg.kmv_k
    base = clusters.filter(F.col("cluster_size") >= min_size)
    if idmap is not None:
        members = base.join(F.broadcast(idmap), "image_id").select(
            "image_id", "id64", "cluster_id"
        )
    else:
        members = base.select(
            "image_id", F.xxhash64("image_id").alias("id64"), "cluster_id"
        )
    sig = signatures.select("id64", "sig")
    joined = members.join(sig, "id64").select("cluster_id", "sig")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_c, out_n, out_s = [], [], []
            for cid, sub in pdf.groupby("cluster_id", sort=False):
                # sig wire format: little-endian int32 bytes
                sigs = [np.frombuffer(s, dtype="<i4") for s in sub["sig"]]
                u = kmv.union_many(sigs, k)
                out_c.append(cid)
                out_n.append(len(sub))
                out_s.append(kmv.serialize(u, k))
            yield pd.DataFrame(
                {"cluster_id": out_c, "n_rows": out_n, "sketch": out_s}
            )

    partials = joined.mapInPandas(
        partial, "cluster_id string, n_rows bigint, sketch binary"
    )

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sigs = [kmv.deserialize(b)[0] for b in pdf["sketch"]]
        u = kmv.union_many(sigs, k)
        lb, est, ub = kmv.estimate_bounds(u, k, 2, hash_space=_HASH_SPACE_32)
        return pd.DataFrame(
            {
                "cluster_id": [key[0]],
                "n_rows": [int(pdf["n_rows"].sum())],
                "kmv_union_est": [est],
                "kmv_union_lb": [lb],
                "kmv_union_ub": [ub],
            }
        )

    kmv_part = partials.groupBy("cluster_id").applyInPandas(final, AUDIT_SCHEMA)

    out = kmv_part
    if corpus is not None:
        from ..functions.kll_agg import kll_quantile_agg

        caps = members.join(corpus.select("image_id", "caption"), "image_id")
        hll = caps.groupBy("cluster_id").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("caption", F.lit(12))).alias(
                "distinct_captions_hll"
            ),
            # the exact twin every estimate column is audited against
            # (clusters are small; at web scale this column is dropped
            # and the HLL/KMV estimates carry the audit)
            F.countDistinct("caption").alias("distinct_captions_exact"),
        )
        kll = kll_quantile_agg(
            caps.select("cluster_id", F.length("caption").alias("cap_len")),
            "cluster_id", "cap_len", quantiles=((1, 2), (99, 100)),
        ).select(
            "cluster_id",
            F.col("q_1_2").cast("int").alias("caption_len_p50"),
            F.col("q_99_100").cast("int").alias("caption_len_p99"),
        )
        out = out.join(hll, "cluster_id").join(kll, "cluster_id")
    return out
