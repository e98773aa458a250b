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

Fully vectorized: shingles hash through the batch kernel
(kernels/shingle.py:char_shingle_hashes, 63-bit lane) and per-pair
distinct/intersection counts come from one lexsort over the flattened
(pair, hash) stream — the same pattern as kernels/kmv.py's batched
Jaccard, no per-row Python set ops. Identity is 63-bit hash equality
(the reference's own identity is hash equality,
theta/UpdatableThetaSketch.java:258); with ~10² shingles per caption
the per-pair collision term is ~10⁴/2⁶³ ≈ 1e-15 — far below any
operational concern, and never hit at tested tiers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.shingle import char_shingle_hashes, normalize_captions

RESCORE_SCHEMA = (
    "id_a string, id_b string, intersect_ct bigint, union_ct bigint, "
    "jaccard_exact double"
)


def _distinct_per_row(h: np.ndarray, rows: np.ndarray):
    """Dedup (row, hash) pairs; rows is already row-sorted (the shingle
    kernel's contract)."""
    if len(h) == 0:
        return rows, h
    order = np.lexsort((h, rows))
    hs, rs = h[order], rows[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    return rs[first], hs[first]


def _char_window_hashes(texts: pd.Series, k: int, seed: int = 9001):
    """(hashes, rows) over CHARACTER k-windows with the JVM
    char_shingles rule (functions/text.py:174): a row shorter than k
    chars (including empty) contributes its whole string — so two
    empty docs share the "" shingle, exactly like the SQL
    substring/generate_series form and its DuckDB oracle twin. Used by
    the ssjoin fallback so plan choice never changes results; the
    corpus-pipeline lane keeps the byte-window kernel (its golden
    builder uses the same byte windows)."""
    from ..functions.sketch_udfs import _hash_strings

    rows: list[int] = []
    subs: list[str] = []
    for i, t in enumerate(texts):
        t = "" if t is None else str(t)
        if len(t) <= k:
            rows.append(i)
            subs.append(t)
            continue
        ws = {t[j:j + k] for j in range(len(t) - k + 1)}
        rows.extend([i] * len(ws))
        subs.extend(ws)
    h = _hash_strings(pd.Series(subs, dtype=object), seed)
    r = np.asarray(rows, dtype=np.int64)
    order = np.argsort(r, kind="stable")
    return h[order], r[order]


def exact_rescore_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.8,
    normalize: bool = True,
    id_type: str = "string",
    broadcast_docs: bool = False,
    char_mode: bool = False,
) -> DataFrame:
    """pairs(id_a, id_b) × docs(id, text) → exact-Jaccard-scored
    pairs with jaccard_exact >= threshold. Ids are carried as
    `id_type` (callers with integral keys keep them integral).

    `char_mode=True` shingles over CHARACTER windows with the JVM
    char_shingles whole-short-string rule (the ssjoin lane's
    semantics — byte windows diverge on non-ASCII text and drop
    empty docs); default byte-window kernel is the corpus-pipeline
    lane's contract.

    The two text joins shuffle only the found pairs plus the texts they
    touch; at web scale docs is bucketed by id so they co-locate
    (`broadcast_docs` for small dimension-sized doc tables)."""
    base = docs.select(
        F.col(id_col).cast(id_type).alias("id"), F.col(text_col).alias("txt")
    )
    ta = base.select(F.col("id").alias("id_a"), F.col("txt").alias("txt_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("txt").alias("txt_b"))
    if broadcast_docs:
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    joined = pairs.select("id_a", "id_b").join(ta, "id_a").join(tb, "id_b")
    schema = RESCORE_SCHEMA.replace("string", id_type, 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            a = normalize_captions(pdf["txt_a"]) if normalize else pdf["txt_a"].fillna("")
            b = normalize_captions(pdf["txt_b"]) if normalize else pdf["txt_b"].fillna("")
            if char_mode:
                ha, ra = _char_window_hashes(a, k)
                hb, rb = _char_window_hashes(b, k)
            else:
                ha, ra = char_shingle_hashes(a, k)
                hb, rb = char_shingle_hashes(b, k)
            ra, ha = _distinct_per_row(ha, ra)
            rb, hb = _distinct_per_row(hb, rb)
            na = np.bincount(ra, minlength=n).astype(np.int64)
            nb = np.bincount(rb, minlength=n).astype(np.int64)
            # intersection: merge both distinct streams, count (pair,
            # hash) values seen twice — one lexsort over the batch
            rows = np.concatenate([ra, rb])
            hs = np.concatenate([ha, hb])
            order = np.lexsort((hs, rows))
            rs, hh = rows[order], hs[order]
            dup = np.zeros(len(rs), dtype=bool)
            if len(rs) > 1:
                dup[1:] = (hh[1:] == hh[:-1]) & (rs[1:] == rs[:-1])
            inter = np.bincount(rs[dup], minlength=n).astype(np.int64)
            # a pair counts only when BOTH sides have shingles (empty
            # text yields no pairs, per the golden builder)
            both = (na > 0) & (nb > 0)
            inter = np.where(both, inter, 0)
            uni = np.where(both, na + nb - inter, 0)
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

    return joined.mapInPandas(gen, schema)
