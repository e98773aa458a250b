"""Similarity search over embedding columns.

 - brute_force_topk_ip: exact top-k by inner product of 1e6-quantized
   vectors. Quantizing to int64 makes the score an exact integer, so
   the DuckDB oracle matches bit-for-bit (float dot products diverge
   across engines in the last ulp and flip rankings).
 - brute_force_topk_cosine: float cosine variant (rows-only check).
 - lsh_topk_cosine: the scale path — sign-random-projection bucketing
   (SimHash over vector components) so each query only scores its
   bucket; brute force within bucket. Approximate by design.

All math stays in Spark built-ins (aggregate/zip_with — JVM codegen),
no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000


def _quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * QUANT).cast("bigint"),
        ).alias("q"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def brute_force_topk_ip(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5
) -> DataFrame:
    """(vec_id, neighbor_id, dot_q, rank) — exact integer MIPS top-k."""
    qa = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("vec_id"), F.col("q").alias("qa")
    )
    qb = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("q").alias("qb")
    )
    scored = (
        qa.crossJoin(qb)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            _dot(F.col("qa"), F.col("qb")).alias("dot_q"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "dot_q", F.col("rank").cast("int").alias("rank"))
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk_cosine(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5
) -> DataFrame:
    a = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", _cosine(F.col("va"), F.col("vb")).alias("cosine"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def brute_force_topk_cosine_q(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5
) -> DataFrame:
    """Oracle-exact cosine top-k: the score is round(cosine·1e9) as a
    bigint. dot and norms are LEFT FOLDS over the components
    (F.aggregate), so an engine that folds in the same order (DuckDB
    list_reduce) reproduces the double bit-for-bit; quantizing to 1e-9
    absorbs any residual last-ulp daylight, and ties break on
    neighbor_id. Same crossJoin-exact-baseline role as
    brute_force_topk_ip."""
    a = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(_cosine(F.col("va"), F.col("vb")) * 1e9).cast("bigint").alias("cos_q"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cos_q", F.col("rank").cast("int").alias("rank"))
    )


def srp_bucket(vec, n_planes: int = 16, seed: int = 9001):
    """Sign-random-projection bucket id via per-component hashed signs:
    bit_j = sign(sum_i h(i,j)·v_i) with h(i,j) = xxhash64(i,j,seed)
    mapped to ±1 — Charikar hyperplanes without shipping a plane
    matrix (pure built-ins, deterministic across executors)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = []
    for j in range(n_planes):
        s = F.aggregate(
            F.zip_with(
                vec,
                idx,
                lambda x, i: x.cast("double")
                * F.when(
                    F.xxhash64(i, F.lit(j), F.lit(seed)) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def lsh_topk_cosine(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5,
    n_planes: int = 4, n_tables: int = 8, seed: int = 9001,
) -> DataFrame:
    """Multi-table bucketed ANN: L independent SRP tables; candidates
    are pairs sharing a bucket in ANY table; exact cosine within
    candidates. Recall for a neighbor at collision prob p per table is
    1-(1-p)^L — the classic LSH recall/compute dial (MMDS ch.3). Turns
    the O(n²) cross join into per-bucket joins.
    """
    buckets = F.array(*[
        srp_bucket(F.col(vec_col), n_planes, seed + 101 * t) for t in range(n_tables)
    ])
    with_b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.posexplode(buckets).alias("table_idx", "bucket"),
    )
    a = with_b.select(
        F.col("id").alias("vec_id"), F.col("v").alias("va"), "table_idx", "bucket"
    )
    b = with_b.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("vb"), "table_idx", "bucket"
    )
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", "va", "vb")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    scored = cand.select(
        "vec_id", "neighbor_id", _cosine(F.col("va"), F.col("vb")).alias("cosine")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
