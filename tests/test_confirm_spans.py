"""Suffix-array span confirmation wired into the verify stage."""

from pyspark.sql import functions as F

from datasketches_java_spark.config import FROZEN
from datasketches_java_spark.operators.verify import confirm_spans


def test_confirm_spans_adds_lcs(spark):
    corpus = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog tonight again", 0),
            ("b", "the quick brown fox jumps over the lazy cat tonight again", 0),
            ("c", "entirely different caption text right here", 0),
        ],
        "image_id string, caption string, phash bigint",
    )
    verified = spark.createDataFrame(
        [("a", "b", 0.75, 0.6, 0.9, 2, 0, True, True, False),
         ("a", "c", 0.74, 0.6, 0.9, 30, 30, True, False, False)],
        "id_a string, id_b string, jaccard_est double, jaccard_lb double, "
        "jaccard_ub double, simhash_hamming int, phash_hamming int, "
        "match_caption boolean, match_simhash boolean, match_phash boolean",
    )
    out = confirm_spans(verified, corpus, FROZEN, margin=0.1).toPandas()
    row_ab = out[(out["id_a"] == "a") & (out["id_b"] == "b")].iloc[0]
    # LCS of the two near-dup captions covers "jumps over the lazy "
    assert row_ab["lcs_len"] >= len("the quick brown fox jumps over the lazy ")
    assert 0 < row_ab["lcs_frac"] <= 1.0
    row_ac = out[(out["id_a"] == "a") & (out["id_b"] == "c")].iloc[0]
    assert row_ac["lcs_len"] < 15
