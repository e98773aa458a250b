"""Corpus-curation operators for LLM-training pipelines: benchmark
decontamination (word-n-gram overlap), repetition statistics (the
Gopher repetition filters), and canonical-document selection (the
keep/drop list a dedup stage actually materializes).

All three are pure relational programs — explode / broadcast-join /
groupBy over JVM column expressions, no Python in the hot path — so
Catalyst keeps them in whole-stage codegen and the only wide exchanges
are the per-document partial aggregations.

Scale notes (100 TB):
- ngram_contamination broadcasts the BENCHMARK gram set, never the
  corpus: a decontamination suite (the published eval benchmarks) is
  a few hundred MB of n-grams at web scale while the corpus side
  streams through map-side; the only shuffle is the per-doc count
  aggregation, which is partial-aggregated before exchange.
- repetition_stats shuffles (doc_id, token) pairs once with map-side
  combine; the per-doc second aggregation reuses the same hash
  partitioning (no extra exchange — doc_id is a prefix of the first
  grouping key).
- dedup_keep_list is one window over the text-hash partitioning —
  identical shape to exact_dedup_groups, emitted row-per-document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams


def ngram_contamination(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    bench_mod: int = 13,
) -> DataFrame:
    """Training-data decontamination: for every non-benchmark document,
    how many of its distinct lowercase word-`n`-grams appear anywhere
    in the benchmark split (here the deterministic `id % bench_mod == 0`
    slice; in production, the eval-suite documents).

    Returns (id, n_contaminated, contaminated) for every non-benchmark
    document, zeros included.
    """
    ic = F.col(id_col)
    grams = docs.select(
        ic, F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    bench = grams.filter(ic % bench_mod == 0).select("gram").distinct()
    hits = (
        grams.filter(ic % bench_mod != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_contaminated"))
    )
    return (
        docs.filter(ic % bench_mod != 0)
        .select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0).cast("bigint")).alias(
                "n_contaminated"
            ),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _bp_long(num, den):
    """Same round-half-up basis-point identity as functions.text._bp,
    over already-bigint aggregate columns."""
    return F.when(den <= 0, F.lit(0).cast("bigint")).otherwise(
        F.floor((F.lit(20000) * num + den) / (F.lit(2) * den))
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features per document: duplicate-word
    fraction, most-common-word fraction, most-common-bigram fraction
    (all integer basis points). Documents with no words are omitted
    (they carry no repetition signal)."""
    ic = F.col(id_col)
    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    words = base.select(
        ic, F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
    )
    wc = words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    per_doc = wc.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("n_distinct_words"),
        F.max("c").cast("bigint").alias("top_word_count"),
    )
    bigrams = base.select(
        ic,
        F.explode(word_ngrams(F.col(text_col), 2, distinct=False)).alias("g"),
    )
    bc = bigrams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    per_doc_bg = bc.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max("c").cast("bigint").alias("top_bigram_count"),
    )
    joined = per_doc.join(per_doc_bg, id_col, "left").select(
        id_col,
        "n_words",
        "n_distinct_words",
        _bp_long(
            F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")
        ).alias("dup_word_bp"),
        _bp_long(F.col("top_word_count"), F.col("n_words")).alias("top_word_bp"),
        _bp_long(
            F.coalesce("top_bigram_count", F.lit(0).cast("bigint")),
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")),
        ).alias("top_bigram_bp"),
    )
    return joined


def dedup_keep_list(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Row-level keep/drop list for exact duplicates: every document
    mapped to its group's canonical (minimum id over identical text),
    with the is_canonical flag a downstream filter consumes. The
    complementary face of exact_dedup_groups (group summaries)."""
    w = Window.partitionBy(F.md5(F.col(text_col)))
    canonical = F.min(F.col(id_col)).over(w)
    return docs.select(
        F.col(id_col),
        canonical.alias("canonical_id"),
        (F.col(id_col) == canonical).alias("is_canonical"),
    )
