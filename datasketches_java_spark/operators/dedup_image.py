"""Image-channel near-dup pairs over a pHash column — the standalone,
oracle-checkable face of the pipeline's pixel channel.

The corpus pipeline (plans/pipeline.py) uses pHash multi-index-hashing
keys as one candidate *channel* feeding the multi-channel verify
(operators/signatures.py:phash_mih_keys); this module exposes the same
semantics as a first-class operator over any (id, phash) table: the
EXACT set of pairs within a Hamming budget, so a brute-force
`bit_count(xor(a, b)) <= h` self-join (the DuckDB oracle) reproduces
it bit-for-bit.

Grounding: Norouzi, Punjani, Fleet — "Fast Search in Hamming Space
with Multi-Index Hashing" (CVPR 2012). Not present in the reference
(SURVEY.md §2a note: the reference has no image/LSH surface); the
pair face mirrors the reference's Jaccard-pair use case
(theta/JaccardSimilarity.java:57-98) on the pixel channel.

Everything is JVM column expressions — the key enumeration is a
`transform(sequence(...))` explode, the verify is `bit_count(^)` —
no Python in the hot path, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4 x 16-bit blocks, each with its base value + 16 one-bit flips:
# two sketches collide on block b's key space whenever that block's
# Hamming distance is <= 2 (0 errors: base==base; 1 error e: base
# meets flip e; 2 errors e1^e2: flip e1 meets flip e2). Pigeonhole
# over 4 blocks: every total-Hamming <= 11 pattern leaves some block
# with <= 2 errors, so candidate recall is GUARANTEED for any verify
# threshold <= 11 — same scheme and constants as the pipeline channel
# (operators/signatures.py:phash_mih_keys).
_N_BLOCKS = 4
_N_FLIPS = 17  # base + 16 one-bit flips
_MIH_GUARANTEE = 11

_KEY_EXPR = (
    f"explode(transform(sequence(0, {_N_BLOCKS * _N_FLIPS - 1}), k -> "
    f"cast(k div {_N_FLIPS} as bigint) * 65536 + ("
    f"  CASE WHEN k % {_N_FLIPS} = 0"
    f"  THEN shiftright(ph, (k div {_N_FLIPS}) * 16) & 65535"
    f"  ELSE (shiftright(ph, (k div {_N_FLIPS}) * 16) & 65535)"
    f"       ^ shiftleft(cast(1 as bigint), k % {_N_FLIPS} - 1) END"
    f"))) AS mk"
)


def phash_dup_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 8,
) -> DataFrame:
    """All pairs whose 64-bit pHashes are within `max_hamming` bits —
    EXACT, not approximate, for max_hamming <= 11 (the MIH block
    guarantee above makes the key join a lossless candidate generator;
    the bit_count verify then makes the result the exact relation).

    Returns (id_a, id_b, hamming) with id_a < id_b.

    Scale shape: one hash-shuffle on the int64 MIH key; candidate rows
    are fixed-width (key, id, phash); 68 keys/row is the price of the
    <= 11 guarantee. The self-join is Σ g(key)² — on a correlated
    pHash distribution that is the dominant cost (measured on the
    synthetic corpus: 18.8M candidates at 20k rows, ~1.3e9 at 200k;
    MIH is still ~16x below brute force but quadratic in hot keys).
    This face is therefore the EXACT-RELATION tier: gates, audits,
    golden construction. Production corpora go through the pipeline's
    pHash channel (operators/signatures.py + operators/lsh.py), which
    pays the same explode but CAPS hot bands before the join — bounded
    O(g·cap) work in exchange for the recall guarantee degrading to
    the capped policy. At the oracle/gate tier the ids are strings for
    transparency; the 10^12 tier keys the exchange on id64 and joins
    ids back once (operators/signatures.py precedent).
    """
    if max_hamming > _MIH_GUARANTEE:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the MIH recall "
            f"guarantee ({_MIH_GUARANTEE}); raise the flip order or "
            f"use the pipeline's verified channel instead"
        )
    keys = df.selectExpr(f"{id_col} AS id", f"{phash_col} AS ph").selectExpr(
        "id", "ph", _KEY_EXPR
    )
    a = keys.select(
        F.col("id").alias("id_a"), F.col("ph").alias("ph_a"), "mk"
    )
    b = keys.select(
        F.col("id").alias("id_b"), F.col("ph").alias("ph_b"), "mk"
    )
    return (
        a.join(b, "mk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr("cast(bit_count(ph_a ^ ph_b) as int)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
