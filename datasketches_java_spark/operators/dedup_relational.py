"""Relational dedup operators over text tables — pure DataFrame ops.

Exact dedup is a hash groupBy; n-gram Jaccard dedup is the exact
similarity self-join (shingle postings → pair intersection counts →
integer threshold test), the relational twin of the sketch pipeline.
At 100 TB the exact join is only viable after the LSH prefilter; here
it doubles as the oracle-checkable query (thresholds compare as exact
integers: t=p/q ⇒ q·|A∩B| >= p·|A∪B|, no float divergence).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_shingles


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: canonical (min) id, dup count, md5."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
        .select("canonical_id", "dup_count", "text_md5")
    )


def ssjoin_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, threshold: float = 0.8,
    normalized: bool = False,
) -> DataFrame:
    """Exact prefix-filtered similarity self-join (PPJoin family: Xiao
    et al. WWW 2008) — all pairs with char-k shingle Jaccard >=
    threshold, scalable: candidates come only from each document's
    (1-t)|x|+1 globally-rarest shingles (lossless prefix lemma) with
    the length filter t·|b| <= |a|, so hot shingles never join.

    Everything stays JVM-side (substring/xxhash64/window), no Python.
    Output: (id_a, id_b, intersect_ct, union_ct, jaccard_exact).
    """
    t = threshold
    text = F.col(text_col)
    if not normalized:
        text = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(text, k)).alias("s"),
    ).select("id", F.xxhash64("s").alias("sh"))

    freq = sh.groupBy("sh").agg(F.count("*").alias("f"))
    from pyspark.sql import Window

    w_rank = Window.partitionBy("id").orderBy("f", "sh")
    w_sz = Window.partitionBy("id")
    ranked = (
        sh.join(freq, "sh")
        .withColumn("pos", F.row_number().over(w_rank))
        .withColumn("sz", F.count("*").over(w_sz))
    )
    pref = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).select("id", "sh", "sz")

    a = pref.alias("a")
    b = pref.alias("b")
    cand = (
        a.join(b, "sh")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") >= t * F.col("b.sz"))
            & (F.col("b.sz") >= t * F.col("a.sz"))
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersect_ct"))
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    ca = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    cb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("union_ct", F.col("na") + F.col("nb") - F.col("intersect_ct"))
        .withColumn(
            "jaccard_exact",
            F.col("intersect_ct").cast("double") / F.col("union_ct"),
        )
        .filter(F.col("jaccard_exact") >= t)
        .select("id_a", "id_b", "intersect_ct", "union_ct", "jaccard_exact")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, threshold: float = 0.8
) -> DataFrame:
    """All id pairs with exact char-k shingle Jaccard >= threshold.

    Output: (id_a, id_b, intersect_ct, union_ct) — integers only, with
    the threshold applied as an exact integer cross-multiplication.
    Implemented on the prefix-filtered SSJoin (the naive full postings
    self-join measured 676s on 5k template docs — hot shingles join
    quadratically; the prefix filter is lossless, results identical).
    """
    frac = Fraction(threshold).limit_denominator(1000)
    p, q = frac.numerator, frac.denominator
    pairs = ssjoin_jaccard_pairs(
        df, id_col, text_col, k, threshold, normalized=True
    )
    # re-apply the threshold as exact integer math (ssjoin uses float)
    return pairs.filter(
        F.lit(q) * F.col("intersect_ct") >= F.lit(p) * F.col("union_ct")
    ).select("id_a", "id_b", "intersect_ct", "union_ct")
