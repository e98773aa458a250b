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
- repetition_stats shuffles (doc_id, token) counts once with map-side
  combine, then a SECOND exchange keys the per-doc rollup on doc_id
  alone (HashPartitioning(doc_id, w) does NOT satisfy a doc_id-only
  clustering — same doc, different w, different partition). Both
  exchanges move partial-aggregated rows, O(distinct (doc, gram)) and
  O(docs) respectively — never raw tokens.
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


# round-half-up basis points — the shared integer identity (its bigint
# casts are no-ops on the aggregate columns used here)
from ..functions.text import _bp as _bp_long  # noqa: E402


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
    complementary face of exact_dedup_groups (group summaries).

    NULL texts are never duplicates of each other (md5(NULL) is NULL,
    which would otherwise pool every null-text row into one "group"
    and drop all but one): each NULL-text document keys to itself and
    stays canonical."""
    key = F.coalesce(
        F.md5(F.col(text_col)),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(key)
    canonical = F.min(F.col(id_col)).over(w)
    return docs.select(
        F.col(id_col),
        canonical.alias("canonical_id"),
        (F.col(id_col) == canonical).alias("is_canonical"),
    )


def cluster_keep_list(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> DataFrame:
    """Near-dup canonical selection: one representative per duplicate
    CLUSTER (the connected-components output), by the curation policy
    LLM pipelines actually ship — keep the longest text, break ties on
    the smallest id. The near-dup complement of dedup_keep_list (which
    canonicalizes exact-hash groups): downstream filters keep
    `is_canonical` rows and the corpus loses one row per duplicate.

    Input `clusters` is (id, cluster_id, ...) — e.g. the pipeline's
    cluster assignment; `docs` supplies the text column. Returns
    (id, cluster_id, is_canonical).

    Scale shape: one broadcast-or-shuffle equi-join on id, then one
    window partitioned by cluster_id. Cluster sizes are bounded by the
    dedup semantics themselves (a cluster IS a near-dup group), so the
    window partition skew is capped by the largest dup family — the
    same bound the audits stage already relies on.
    """
    j = clusters.join(
        docs.select(
            F.col(id_col), F.length(F.col(text_col)).alias("_len")
        ),
        id_col,
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_len").desc(), F.col(id_col).asc()
    )
    return j.select(
        id_col,
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def sequence_pack(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
    n_shards: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid head-to-tail
    into a token stream per shard, and the stream is cut every `budget`
    tokens; a document's pack is the chunk its FIRST token lands in
    (the standard GPT-style pretraining packing — documents may straddle
    chunk boundaries, the loader masks across them).

    Returns (id, shard, n_tokens, pack_id, pack_offset): pack_offset is
    the document's starting token position within its pack.

    Scale shape: packing is a running sum, inherently sequential — so it
    must never be a GLOBAL window (one task owning 100 TB). Sharding
    makes it embarrassingly parallel: each shard packs its own stream
    independently (pack identity is (shard, pack_id)), which is exactly
    how a multi-node loader consumes packs anyway. `shard_col` names an
    existing column (e.g. source); `n_shards` > 0 adds a deterministic
    id-hash sub-shard so one giant source still spreads over the
    cluster. The window sort key is the id — deterministic, no
    tie-break ambiguity for the oracle.
    """
    from ..functions.text import token_count

    ic = F.col(id_col)
    if shard_col is None and n_shards <= 0:
        raise ValueError("give shard_col and/or n_shards: a global "
                         "packing window cannot scale")
    parts = []
    if shard_col is not None:
        parts.append(F.col(shard_col))
    if n_shards > 0:
        parts.append(F.pmod(F.xxhash64(ic.cast("string")), F.lit(n_shards)))
    shard = F.concat_ws("/", *[p.cast("string") for p in parts])

    base = docs.select(
        ic.alias("id"),
        shard.alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    # rowsBetween: the default RANGE frame pools order-by TIES, so two
    # rows sharing an id would both receive the combined cumulative sum
    # (overlapping offsets); ROWS confines each row to its own prefix.
    # Ids are expected unique — with duplicates the within-tie order
    # (and thus which doc gets which offset) is frame-order dependent.
    w = (Window.partitionBy("shard").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    return base.select(
        "id", "shard", "n_tokens", start
    ).select(
        "id", "shard", "n_tokens",
        (F.col("__start") / budget).cast("bigint").alias("pack_id"),
        (F.col("__start") % budget).cast("bigint").alias("pack_offset"),
    )


def split_leakage_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_mod: int = 10,
    eval_col: F.Column | None = None,
) -> DataFrame:
    """Train/eval leakage audit for exact near-dup groups: a TRAIN
    document leaks if any document with identical text landed in the
    EVAL split (`eval_col` is the boolean split column; default: the
    deterministic id-hash split pmod(xxhash64(id), eval_mod)==0).

    Returns every train document (id, leaked, n_eval_dups) — the table
    a pre-training filter joins against to drop contaminated rows.

    Scale shape: one groupBy on the text hash carrying two partial
    counts (map-side combined), then a row-level join back on the same
    key — no second shuffle; the eval side is a boolean aggregate, so
    nothing resembling a crossJoin appears at any size.
    """
    ic = F.col(id_col)
    is_eval = (
        eval_col if eval_col is not None
        else F.pmod(F.xxhash64(ic.cast("string")), F.lit(eval_mod)) == 0
    )
    # NULL-safe key: md5(NULL) is NULL, which the equi-join would drop
    # (silently losing null-text train rows) — key them to themselves
    keyed = docs.select(
        ic.alias("id"),
        F.coalesce(
            F.md5(F.col(text_col)),
            F.concat(F.lit("null:"), ic.cast("string")),
        ).alias("__h"),
        is_eval.alias("__eval"),
    )
    per_group = keyed.groupBy("__h").agg(
        F.sum(F.col("__eval").cast("bigint")).alias("n_eval_dups")
    )
    return (
        keyed.filter(~F.col("__eval"))
        .join(per_group, "__h")
        .select(
            "id",
            (F.col("n_eval_dups") > 0).alias("leaked"),
            F.col("n_eval_dups").cast("bigint").alias("n_eval_dups"),
        )
    )
