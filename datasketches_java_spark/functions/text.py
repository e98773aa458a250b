"""Text-analysis operators for training-data pipelines, as pure Spark
column expressions (JVM-side, whole-stage codegen — no Python in the
hot path): token counting, quality scoring, language-ID heuristic,
document fingerprinting, char-n-gram shingling.

Ratio outputs are integer basis points computed with the exact
round-half-up identity  bp = (20000*num + den) div (2*den)  so the
DuckDB oracle can reproduce them bit-for-bit (no float rounding
divergence between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = r"[.,!?;:]"
STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    ).cast("bigint")


# BPE-ish pre-tokenizer rule (GPT-2 family, ASCII-restricted so Spark's
# Java regex and DuckDB's RE2 match byte-for-byte — no lookahead, no
# unicode property classes): a token is a letter run, a digit run, or
# ONE non-alnum-non-space char. Whitespace separates, never counts.
# Engine-parity caveat: the negated class counts one UTF-16 code unit
# in Java vs one code point in RE2, so non-BMP chars (emoji) count 2 vs
# 1; BMP text — all of the gate corpus — is identical in both engines.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count under the BPE pre-tokenizer rule —
    the budget estimator an LLM-training pipeline runs per document
    (whitespace token_count underestimates code/punctuation-heavy
    text). Pure JVM expression (regexp_count, codegen)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("bigint")


def _bp(num: Column, den: Column) -> Column:
    """Round-half-up basis points in pure integer arithmetic."""
    num = num.cast("bigint")
    den = den.cast("bigint")
    # floor of a correctly-rounded double quotient of exact <2^53 ints
    # is exact, and DuckDB's integer // floors identically
    return F.when(den <= 0, F.lit(0).cast("bigint")).otherwise(
        F.floor((F.lit(20000) * num + den) / (F.lit(2) * den))
    )


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def stopword_count(text: Column) -> Column:
    toks = tokens(F.lower(text))
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-score feature columns (all integer, oracle-stable)."""
    n_chars = F.length(text)
    n_tok = token_count(text)
    return {
        "n_chars_calc": n_chars.cast("bigint"),
        "n_tokens": n_tok,
        "punct_bp": _bp(punct_count(text), n_chars),
        "stopword_bp": _bp(stopword_count(text), n_tok),
        "ws_bp": _bp(
            F.length(text) - F.length(F.regexp_replace(text, r"\s", "")), n_chars
        ),
    }


def lang_id(text: Column) -> Column:
    """n-gram/stopword language heuristic: 'en' when English stopwords
    make up >= 2% of tokens, else 'und'. (A real model would plug in
    here; the Spark plumbing — pure expression, no UDF — is the point.)
    """
    return F.when(
        _bp(stopword_count(text), token_count(text)) >= 200, F.lit("en")
    ).otherwise(F.lit("und"))


def char_shingles(text: Column, k: int) -> Column:
    """Distinct char-k shingles as an array (JVM-side, for relational
    dedup; the sketch path uses the NumPy kernel instead)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(text, i, k)))


def fingerprint(text: Column, k: int = 8) -> Column:
    """Bottom-1 sketch of char-k shingles under md5 — a deterministic
    64-hex document fingerprint (rolling-hash family, KMV with k=1)."""
    return F.array_min(F.transform(char_shingles(text, k), F.md5))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    out = df
    for name, col in quality_columns(c).items():
        out = out.withColumn(name, col)
    return out.withColumn("lang_pred", lang_id(c)).withColumn(
        "fingerprint", fingerprint(c)
    )
