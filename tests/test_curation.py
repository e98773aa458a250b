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


def test_sequence_pack_chunks(spark):
    from datasketches_java_spark.operators.curation import sequence_pack

    # shard A token stream: 3 + 4 + 2 + 5 tokens, budget 6:
    #   doc 1 starts at 0  -> pack 0 off 0
    #   doc 2 starts at 3  -> pack 0 off 3   (straddles into pack 1)
    #   doc 3 starts at 7  -> pack 1 off 1
    #   doc 4 starts at 9  -> pack 1 off 3
    # shard B restarts its own stream at 0.
    rows = [
        (1, "A", "a b c"),
        (2, "A", "d e f g"),
        (3, "A", "h i"),
        (4, "A", "j k l m n"),
        (5, "B", "x y z w q u v"),   # 7 tokens -> pack 0 off 0
        (6, "B", "r"),               # starts at 7 -> pack 1 off 1
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["id"]: r for r in sequence_pack(
        df, budget=6, shard_col="source").collect()}
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (0, 0)
    assert (out[2]["pack_id"], out[2]["pack_offset"]) == (0, 3)
    assert (out[3]["pack_id"], out[3]["pack_offset"]) == (1, 1)
    assert (out[4]["pack_id"], out[4]["pack_offset"]) == (1, 3)
    assert (out[5]["pack_id"], out[5]["pack_offset"]) == (0, 0)
    assert (out[6]["pack_id"], out[6]["pack_offset"]) == (1, 1)
    assert out[5]["shard"] == "B" and out[2]["n_tokens"] == 4


def test_sequence_pack_sub_sharding(spark):
    from datasketches_java_spark.operators.curation import sequence_pack

    rows = [(i, "s", "one two three") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = sequence_pack(df, budget=9, shard_col="source", n_shards=4)
    shards = [r["shard"] for r in out.select("shard").distinct().collect()]
    assert len(shards) > 1 and all(s.startswith("s/") for s in shards)
    # every shard's stream still packs 3 docs per 9-token budget
    first = out.filter(F.col("pack_offset") == 0).count()
    assert first > 0

    with pytest.raises(ValueError):
        sequence_pack(df, budget=9)  # global window refused


def test_split_leakage_audit(spark):
    from datasketches_java_spark.operators.curation import split_leakage_audit

    rows = [
        (10, "dup text"),    # eval (10 % 10 == 0)
        (11, "dup text"),    # train, leaks via doc 10
        (12, "clean one"),
        (13, "shared train"),
        (14, "shared train"),  # dup of 13 but both train -> no leak
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["id"]: r for r in split_leakage_audit(
        df, eval_col=(F.col("doc_id") % 10 == 0)).collect()}
    assert set(out) == {11, 12, 13, 14}     # eval doc 10 excluded
    assert out[11]["leaked"] and out[11]["n_eval_dups"] == 1
    assert not out[12]["leaked"]
    assert not out[13]["leaked"] and not out[14]["leaked"]


def test_null_text_rows_are_not_duplicates_of_each_other(spark):
    """md5(NULL) is NULL: without the NULL-safe key, every null-text
    doc pooled into one 'duplicate group' (dedup_keep_list dropped all
    but one) and vanished from split_leakage_audit's inner join."""
    import pandas as pd

    from datasketches_java_spark.operators.curation import (
        dedup_keep_list,
        split_leakage_audit,
    )
    from pyspark.sql import functions as F

    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["same", "same", None, None, None, "solo"],
    })
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keep = dedup_keep_list(df).toPandas().set_index("doc_id")
    assert not keep.loc[2, "is_canonical"]       # real dup group
    assert keep.loc[[3, 4, 5], "is_canonical"].all()  # nulls all kept
    audit = split_leakage_audit(
        df, eval_col=(F.col("doc_id") == 1)).toPandas()
    # all five non-eval docs present, incl. the null-text ones
    assert sorted(audit.id) == [2, 3, 4, 5, 6]
    assert bool(audit.set_index("id").loc[2, "leaked"])
    assert not audit.set_index("id").loc[[3, 4, 5, 6], "leaked"].any()


def test_sequence_pack_duplicate_ids_get_disjoint_offsets(spark):
    """ROWS frame: duplicate order keys must not pool their cumulative
    sums (RANGE gave both tied rows the combined sum -> overlapping
    pack offsets)."""
    import pandas as pd

    from datasketches_java_spark.operators.curation import sequence_pack

    rows = pd.DataFrame({
        "doc_id": [7, 7, 8],
        "text": ["a b c d e", "x y z", "q r"],
    })
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sequence_pack(df, budget=1000, shard_col=None, n_shards=1,
                        id_col="doc_id", text_col="text").toPandas()
    # offsets are a disjoint prefix tiling: sorted starts == cumsum
    out = out.sort_values("pack_offset")
    starts = out.pack_offset.tolist()
    sizes = out.n_tokens.tolist()
    expect = [0]
    for n in sizes[:-1]:
        expect.append(expect[-1] + n)
    assert starts == expect


def test_token_count_null_text_is_zero(spark):
    """size(split(NULL)) is -1 under legacy sizeOfNull — a NULL text
    must count 0 tokens, not poison SUM(n_tokens) budgets."""
    import pandas as pd

    from datasketches_java_spark.functions.text import token_count
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"text": [None, "", "  ", "a b"]}), "text string")
    got = df.select(token_count(F.col("text")).alias("n")).toPandas().n.tolist()
    assert got == [0, 0, 0, 2]


def test_alpha_words_split_on_all_java_whitespace(spark):
    """\\r / \\f / \\v separate words exactly like token_count's \\s+
    splitter, so a 100%-alphabetic CR-separated document passes the
    Gopher alpha gate."""
    import pandas as pd

    from datasketches_java_spark.functions.text import gopher_columns

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["abc\rdef ghi\x0cjkl mno pqr stu vwx yz aa"]}),
        "text string")
    from pyspark.sql import functions as F

    cols = gopher_columns(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]
    assert row["alpha_word_bp"] == 10000
