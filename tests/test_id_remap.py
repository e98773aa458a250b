"""The 128-bit id-remap quarantine lane (operators/signatures.py
build_id_remap): under a deliberately narrow id hash (forced birthday
collisions, the path a 10^12-row corpus hits ~27 times), the pipeline
with id_remap=True must produce the SAME clusters as a clean run —
colliding ids get the second-seed tiebreak key instead of silently
merging through every downstream stage."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datasketches_java_spark.config import DedupConfig

TEXT_CFG = DedupConfig(phash_bands=0, phash_max_hamming=-1)

def _narrow():
    # column exprs need a live session; build lazily inside tests
    return F.pmod(F.xxhash64("image_id"), F.lit(8)).cast("bigint")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        cap = f"a perfectly unique caption about subject number {i} with detail"
        rows.append((f"img{i:03d}", cap))
    # two true duplicate groups the clustering must find
    rows.append(("dup_a1", rows[0][1]))
    rows.append(("dup_a2", rows[0][1]))
    rows.append(("dup_b1", rows[5][1] + "!"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "caption"])
    )


def _cluster_map(res):
    return {
        r["image_id"]: r["cluster_id"] for r in res.clusters.collect()
    }


def test_narrow_key_collides_without_remap(spark, corpus):
    from datasketches_java_spark.operators.signatures import id_collision_audit

    audit = id_collision_audit(corpus, key=_narrow())
    assert audit.count() > 0  # the narrow hash really collides


def test_remap_table_restores_unique_keyspace(spark, corpus):
    from datasketches_java_spark.operators.signatures import (
        apply_id_remap, build_id_remap,
    )

    remap = build_id_remap(corpus, key=_narrow())
    assert remap.count() > 0
    keyed = apply_id_remap(corpus, remap, key=_narrow())
    dup = (
        keyed.groupBy("id64")
        .agg(F.countDistinct("image_id").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert dup.count() == 0  # combined 128-bit lane is collision-free


def test_pipeline_correct_clusters_under_forced_collision(spark, corpus):
    from datasketches_java_spark.plans.pipeline import run_pipeline

    clean = run_pipeline(spark, corpus, TEXT_CFG)
    forced = run_pipeline(
        spark, corpus, TEXT_CFG, id_remap=True, id_key=_narrow()
    )
    assert forced.metrics["id_remapped_rows"] > 0
    assert _cluster_map(forced) == _cluster_map(clean)
    # sanity: the true duplicate groups really cluster together
    cm = _cluster_map(clean)
    assert cm["dup_a1"] == cm["dup_a2"] == cm["img000"]
