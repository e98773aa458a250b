"""Connected components over the verified edge list — star contraction.

Catalyst has no fixpoint operator (SURVEY.md §4 custom work #2), so
this is a driver loop of DataFrame contractions: every node merges
into the minimum id of its closed neighborhood, the edge set is
rewritten between supernodes (self-loops dropped, multi-edges
deduped), and the loop repeats until no edges remain. Each contraction
removes at least half of the remaining supernodes per component, so
the edge set shrinks geometrically — O(log n) rounds REGARDLESS of id
order. (The classic min-label-propagation + pointer-jumping loop is
O(log n) only on monotone id layouts; with random 64-bit ids every
descending run boundary is a local minimum that stalls the wave —
measured 37+ rounds on a 30k-node near-dup component where contraction
takes 11.) Equivalent family: large-star/small-star, Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014.

Rounds checkpoint to parquet and read back (at production scale: an
Iceberg state table — same call site). Parquet, NOT `localCheckpoint`:
Spark 4's LogicalRDD preserves the origin plan for stats estimation,
so chained localCheckpoints nest joins inside stats;
SizeInBytesOnlyStatsPlanVisitor multiplies sizeInBytes across joins
(repeated squaring), and by ~10 rounds the BigInteger products reach
1e8 digits — one planning pass then burns CPU-minutes in
BigInteger.multiply. A parquet round-trip severs the stats chain. The
loop runs at its own shuffle parallelism, derived from the edge count,
so each round costs a handful of tasks instead of
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


def _contract(E: DataFrame):
    """One star-contraction step: (contracted edges, node→supernode map).
    Every node maps to min(closed neighborhood); the global component
    minimum maps to itself, so the fixpoint label IS the component min
    (the golden oracle's cluster_id convention)."""
    sym = E.select("u", "v").unionByName(
        E.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.first("u"), F.min("v")).alias("m"))
    mu = m.select(F.col("u").alias("u"), F.col("m").alias("mu"))
    mv = m.select(F.col("u").alias("v"), F.col("m").alias("mv"))
    E2 = (
        E.join(mu, "u").join(mv, "v")
        .select(F.col("mu").alias("u"), F.col("mv").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    return E2, m


def _apply_map(labels: DataFrame, m: DataFrame) -> DataFrame:
    ml = m.select(F.col("u").alias("label"), F.col("m").alias("newl"))
    return labels.join(ml, "label", "left").select(
        "x", F.coalesce(F.col("newl"), F.col("label")).alias("label")
    )


# one task comfortably owns this many tail edges (~16 B/row = 3.2 MB)
TAIL_EDGES = 200_000


def _unionfind_finish(E: DataFrame) -> DataFrame:
    """Tail finisher: once contraction shrinks the edge set under
    TAIL_EDGES, path-compressed union-find in ONE executor task beats
    O(log n) more distributed rounds of pure scheduling latency — the
    same small-side cutover AQE applies to joins. Returns the
    (supernode u → component-min root) map."""
    import pandas as pd

    def gen(batches):
        import numpy as np

        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        df = pd.concat(chunks, ignore_index=True)
        ids, inv = np.unique(
            np.concatenate([df["u"].to_numpy(np.int64), df["v"].to_numpy(np.int64)]),
            return_inverse=True,
        )
        a, b = inv[: len(df)], inv[len(df):]
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for i in range(len(a)):
            ra, rb = find(a[i]), find(b[i])
            if ra != rb:
                # min-id root keeps the oracle's cluster_id convention
                if ids[ra] < ids[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.array([find(i) for i in range(len(ids))])
        yield pd.DataFrame({"u": ids, "m": ids[roots]})

    return E.repartition(1).mapInPandas(gen, "u bigint, m bigint")


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "id64",
    max_iter: int = 25,
    n_edges: int | None = None,
    metrics: dict | None = None,
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
        E = _pq_checkpoint(
            edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .repartition(n_parts, "u"),
            state_root, "edges_0",
        )
        labels = _pq_checkpoint(
            E.select(F.col("u").alias("x"))
            .unionByName(E.select(F.col("v").alias("x")))
            .distinct()
            .select("x", F.col("x").alias("label")),
            state_root, "labels_0",
        )

        rounds = 0
        remaining = n_edges
        while remaining > TAIL_EDGES and rounds < max_iter:
            # two contraction steps per checkpoint: halves the
            # materialization/latency overhead of the geometric tail
            E1, m1 = _contract(E)
            E2, m2 = _contract(E1)
            rounds += 2
            new_labels = _apply_map(_apply_map(labels, m1), m2)
            labels = _pq_checkpoint(new_labels, state_root, f"labels_{rounds}")
            E = _pq_checkpoint(E2, state_root, f"edges_{rounds}")
            remaining = E.count()
            for name in (f"labels_{rounds - 2}", f"edges_{rounds - 2}"):
                shutil.rmtree(os.path.join(state_root, name), ignore_errors=True)
            if metrics is not None:
                metrics["cc_rounds"] = rounds
                metrics["cc_edges_remaining"] = remaining
        if remaining > 0:
            labels = _pq_checkpoint(
                _apply_map(labels, _unionfind_finish(E)),
                state_root, f"labels_{rounds + 1}",
            )
            if metrics is not None:
                metrics["cc_rounds"] = rounds + 1

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
