"""Corpus-curation operators: Gopher quality gates, repetition stats,
n-gram decontamination, canonical-doc keep lists (operators/curation.py
+ functions/text.py gopher_columns)."""

import pytest
from pyspark.sql import functions as F

from datasketches_java_spark.functions.text import gopher_columns, word_ngrams
from datasketches_java_spark.operators.curation import (
    dedup_keep_list,
    ngram_contamination,
    repetition_stats,
)


def _rows(df):
    return {r[0]: r for r in df.collect()}


def test_gopher_columns(spark):
    good = " ".join(["word"] * 30)  # 30 words, mean len 4.0, all alpha
    rows = [
        ("good", good),
        ("short", "too few words"),
        ("bullets", "- one\n- two\n- three\nplain line here ok yes sure now"),
        ("ellipsis", "first line...\nsecond line...\nthird stays"),
        ("numeric", " ".join(["123"] * 40)),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    cols = gopher_columns(F.col("text"))
    out = _rows(df.select("doc_id", *[c.alias(n) for n, c in cols.items()]))

    g = out["good"]
    assert g["n_words"] == 30 and g["mean_word_len_bp"] == 40000
    assert g["alpha_word_bp"] == 10000 and g["gopher_pass"]

    assert out["short"]["n_words"] == 3 and not out["short"]["gopher_pass"]

    b = out["bullets"]
    assert b["n_lines"] == 4 and b["bullet_line_bp"] == 7500

    e = out["ellipsis"]
    assert e["n_lines"] == 3 and e["ellipsis_line_bp"] == 6667

    n = out["numeric"]  # digit-only words: alpha fraction 0 -> fail
    assert n["alpha_word_bp"] == 0 and not n["gopher_pass"]

    assert out["empty"]["n_words"] == 0 and not out["empty"]["gopher_pass"]


def test_word_ngrams(spark):
    df = spark.createDataFrame(
        [("a", "A b c b c"), ("b", "one two"), ("c", "")],
        "doc_id string, text string",
    )
    out = _rows(
        df.select(
            "doc_id",
            word_ngrams(F.col("text"), 2, distinct=False).alias("all"),
            word_ngrams(F.col("text"), 2).alias("dst"),
        )
    )
    assert out["a"]["all"] == ["a b", "b c", "c b", "b c"]
    assert out["a"]["dst"] == ["a b", "b c", "c b"]
    assert out["b"]["all"] == ["one two"]
    assert out["c"]["all"] == []


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            ("rep", "the cat the cat the dog"),
            ("uniq", "alpha beta gamma delta"),
            ("blank", "   "),
        ],
        "doc_id string, text string",
    )
    out = _rows(repetition_stats(df))
    assert "blank" not in out  # no words -> omitted

    r = out["rep"]  # 6 words, 3 distinct {the:3, cat:2, dog:1}
    assert r["n_words"] == 6 and r["n_distinct_words"] == 3
    assert r["dup_word_bp"] == 5000 and r["top_word_bp"] == 5000
    # bigrams: "the cat","cat the","the cat","cat the","the dog" -> top 2/5
    assert r["top_bigram_bp"] == 4000

    u = out["uniq"]
    assert u["dup_word_bp"] == 0 and u["top_word_bp"] == 2500


def test_ngram_contamination(spark):
    bench_text = "a b c d e f g h"  # doc 0: benchmark (0 % 13 == 0)
    rows = [
        (0, bench_text),
        (1, "a b c d e zz yy"),  # shares exactly 'a b c d e'
        (2, "zz yy xx ww vv uu"),  # clean
        (3, "too short"),  # < 5 words -> zero grams
        (14, "c d e f g h tail"),  # shares 'c d e f g' and 'd e f g h'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(ngram_contamination(df, n=5, bench_mod=13))
    assert set(out) == {1, 2, 3, 14}  # benchmark doc itself excluded
    assert out[1]["n_contaminated"] == 1 and out[1]["contaminated"]
    assert out[2]["n_contaminated"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_contaminated"] == 0
    assert out[14]["n_contaminated"] == 2


def test_dedup_keep_list(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "other"), (2, "same text")],
        "doc_id long, text string",
    )
    out = _rows(dedup_keep_list(df))
    assert out[1]["canonical_id"] == 1 and out[1]["is_canonical"]
    assert out[5]["canonical_id"] == 1 and not out[5]["is_canonical"]
    assert out[2]["canonical_id"] == 1 and not out[2]["is_canonical"]
    assert out[3]["canonical_id"] == 3 and out[3]["is_canonical"]
