"""Exact rescoring of candidate/verified pairs — the high-precision
confirmation stage.

The LSH pipeline's outputs are estimates; for oracle-gradeable results
(and for production runs that need zero false positives) every found
pair is re-scored with the EXACT char-k-shingle Jaccard, computed from
the two captions. Only the found pairs re-fetch text — O(pairs), never
O(n²) — so this composes with any candidate generator. Shingle
semantics match the golden oracle builder exactly
(corpus/generate.py:exact_jaccard_pairs): distinct char-k substrings
of the (optionally normalized) text, whole string when shorter than k,
empty text yields no shingles and therefore no pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.shingle import normalize_captions

RESCORE_SCHEMA = (
    "id_a string, id_b string, intersect_ct bigint, union_ct bigint, "
    "jaccard_exact double"
)


def _shingle_set(text: str, k: int) -> set:
    if not text:
        return set()
    if len(text) <= k:
        return {text}
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def exact_rescore_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.8,
    normalize: bool = True,
) -> DataFrame:
    """pairs(id_a, id_b string) × docs(id, text) → exact-Jaccard-scored
    pairs with jaccard_exact >= threshold.

    The two text joins shuffle only the found pairs plus the texts they
    touch; at web scale docs is bucketed by id so they co-locate."""
    base = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("txt")
    )
    ta = base.select(F.col("id").alias("id_a"), F.col("txt").alias("txt_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("txt").alias("txt_b"))
    joined = pairs.select("id_a", "id_b").join(ta, "id_a").join(tb, "id_b")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = normalize_captions(pdf["txt_a"]) if normalize else pdf["txt_a"].fillna("")
            b = normalize_captions(pdf["txt_b"]) if normalize else pdf["txt_b"].fillna("")
            inter = np.zeros(len(pdf), dtype=np.int64)
            uni = np.zeros(len(pdf), dtype=np.int64)
            for i, (x, y) in enumerate(zip(a, b)):
                sx, sy = _shingle_set(x, k), _shingle_set(y, k)
                if not sx or not sy:
                    continue
                ii = len(sx & sy)
                inter[i] = ii
                uni[i] = len(sx) + len(sy) - ii
            with np.errstate(invalid="ignore", divide="ignore"):
                j = np.where(uni > 0, inter / np.maximum(uni, 1), 0.0)
            out = pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "intersect_ct": inter,
                    "union_ct": uni,
                    "jaccard_exact": j,
                }
            )
            yield out[out["jaccard_exact"] >= threshold]

    return joined.mapInPandas(gen, RESCORE_SCHEMA)
