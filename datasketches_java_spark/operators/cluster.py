"""Connected components over the verified edge list.

Catalyst has no fixpoint operator (SURVEY.md §4 custom work #2), so
this is a driver loop of DataFrame joins: min-label propagation with
pointer jumping (label(x) ← label(label(x)) each round), which
converges in O(log n) rounds even on path graphs. Equivalent to the
two-phase large-star/small-star construction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) but with
half the joins per round. The LSH stage emits hot groups as min-member
STARS (operators/lsh.py), so the dup graph's diameter is small by
construction and the loop usually converges in 2-3 rounds.

Each iteration checkpoints the label table to parquet and reads it
back (at production scale: an Iceberg state table — same call site).
Parquet, NOT `localCheckpoint`: Spark 4's LogicalRDD preserves the
origin plan for stats estimation, so chained localCheckpoints build a
per-round-deepening join nest inside stats; SizeInBytesOnlyStatsPlan-
Visitor multiplies sizeInBytes across joins (repeated squaring), and
by ~10 rounds the BigInteger products reach 10^8 digits — one planning
pass then burns CPU-minutes in BigInteger.multiply. A parquet
round-trip severs the stats chain for good. The loop runs at its own
shuffle parallelism, derived from the edge count, so each O(log n)
round costs a handful of tasks instead of
spark.sql.shuffle.partitions tasks per join.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pq_checkpoint(df: DataFrame, root: str, name: str) -> DataFrame:
    """Materialize to parquet and read back — a plan-and-stats barrier
    (Iceberg state-table write at production scale)."""
    path = os.path.join(root, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "id64",
    max_iter: int = 25,
    n_edges: int | None = None,
) -> DataFrame:
    """edges(id_a, id_b) + vertices(id_col) → (id_col, cluster_id,
    cluster_size); cluster_id = min member id. Ids are the internal
    int64 keys; the pipeline boundary remaps to strings and applies the
    oracle's min-image_id convention.

    Only vertices that appear in an edge enter the iteration — at web
    scale the overwhelming majority of rows are singletons and must not
    pay the per-iteration shuffles; they rejoin as size-1 clusters at
    the end."""
    spark = edges.sparkSession
    if n_edges is None:
        n_edges = edges.count()
    par = spark.sparkContext.defaultParallelism
    # ~500k symmetric edge rows per partition: a handful of tasks per
    # round at bench scale, linear growth when the dup graph is a large
    # fraction of a web corpus (no hardcoded cap)
    n_parts = int(np.clip(2 * n_edges / 500_000, 4, 4 * par))

    state_root = tempfile.mkdtemp(prefix="cc_state_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        sym = _pq_checkpoint(
            edges.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
            .unionByName(
                edges.select(F.col("id_b").alias("x"), F.col("id_a").alias("y"))
            )
            .repartition(n_parts, "x"),
            state_root, "sym",
        )

        # round-0 fused into initialization: label(x) = min(x, min
        # neighbor) in the same shuffle that builds the label table
        labels = _pq_checkpoint(
            sym.groupBy("x")
            .agg(F.least(F.first("x"), F.min("y")).alias("label")),
            state_root, "labels_0",
        )

        rounds_done = 0
        for _ in range(max_iter):
            # neighbor-min: smallest label among my neighbors
            neigh = (
                sym.join(labels, sym["y"] == labels["x"])
                .groupBy(sym["x"].alias("x"))
                .agg(F.min("label").alias("nlabel"))
            )
            new_labels = (
                labels.join(neigh, "x", "left")
                .select(
                    "x",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                    ).alias("label"),
                )
            )
            # pointer jump: label(x) <- label(label(x))
            l2 = new_labels.select(
                F.col("x").alias("lx"), F.col("label").alias("llabel")
            )
            rounds_done += 1
            jumped = _pq_checkpoint(
                new_labels.join(l2, new_labels["label"] == l2["lx"], "left")
                .select(
                    "x",
                    F.least(
                        F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))
                    ).alias("label"),
                ),
                state_root, f"labels_{rounds_done}",
            )
            changed = (
                jumped.alias("n")
                .join(labels.alias("o"), "x")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            # previous round's state is no longer referenced by any plan
            prev = os.path.join(state_root, f"labels_{rounds_done - 1}")
            shutil.rmtree(prev, ignore_errors=True)
            labels = jumped
            if changed == 0:
                break

        sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
        connected = labels.join(sizes, "label").select(
            F.col("x").alias(id_col),
            F.col("label").alias("cluster_id"),
            F.col("cluster_size").cast("int").alias("cluster_size"),
        )
        singletons = (
            vertices.select(F.col(id_col))
            .join(labels.select(F.col("x").alias(id_col)), id_col, "left_anti")
            .select(
                F.col(id_col),
                F.col(id_col).alias("cluster_id"),
                F.lit(1).cast("int").alias("cluster_size"),
            )
        )
        return connected.unionByName(singletons)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
