"""Pair verification — the reference's JaccardSimilarity applied per
candidate pair (theta/JaccardSimilarity.java:57-98 math via kernels.kmv),
plus SimHash Hamming and pHash Hamming channels.

Candidates join back to the signature table twice (shuffle hash join on
the fixed-width id64 key — at scale both sides are pre-bucketed by id
so this co-locates), then one Arrow pass scores every channel. No
caption or pixel bytes move here — the joined row is ~450 B (int32
signature + two int64 hashes); optional exact-span LCS confirmation
(kernels.suffix) runs in a second, much smaller pass only for pairs
inside the decision margin.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN
from ..kernels import kmv
from ..kernels.simhash import hamming64

VERIFY_SCHEMA = (
    "id_a bigint, id_b bigint, jaccard_est double, jaccard_lb double, "
    "jaccard_ub double, simhash_hamming int, phash_hamming int, "
    "match_caption boolean, match_simhash boolean, match_phash boolean"
)


def _binary_flat(arr) -> tuple[np.ndarray, np.ndarray]:
    """(int32 values back-to-back, per-row int64 lengths) of an Arrow
    binary column holding the little-endian int32 sig wire format —
    zero per-row Python: the Arrow data buffer IS the flat value array
    and the offsets ARE the lengths."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("sig column must not contain nulls")
    off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    vals = np.frombuffer(bufs[2], dtype="<i4") if bufs[2] is not None \
        else np.empty(0, "<i4")
    return (
        vals[offsets[0] // 4 : offsets[-1] // 4],
        np.diff(offsets) // 4,
    )


def _verify_arrow(cfg: DedupConfig):
    """mapInArrow verifier: the joined rows' dominant payload is the
    two sig binary columns; reading them straight from the Arrow
    buffers avoids materializing per-row Python bytes objects (the
    pandas transport's copy) AND feeds kmv.jaccard_bounds_flat with no
    per-row work at all (guide §4.2)."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vals_a, la = _binary_flat(batch.column("sig_a"))
            vals_b, lb_ = _binary_flat(batch.column("sig_b"))
            lb, est, ub = kmv.jaccard_bounds_flat_chunked(
                vals_a, la, vals_b, lb_, cfg.kmv_k, 2.0
            )
            # empty-caption rule (matches the golden oracle: empty text
            # yields no shingles and therefore no pairs): a pair where
            # EITHER caption produced no shingles can never match on a
            # text channel — the theta convention "two empties are
            # exactly equal" (J=1) and simhash(0)==simhash(0) would
            # otherwise mark caption-less images as caption duplicates.
            text_ok = (la > 0) & (lb_ > 0)
            sim_a = batch.column("sim_a").to_numpy()
            sim_b = batch.column("sim_b").to_numpy()
            ph_a = batch.column("ph_a").to_numpy()
            ph_b = batch.column("ph_b").to_numpy()
            sh = hamming64(sim_a, sim_b)
            ph = hamming64(ph_a, ph_b)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("id_a"),
                    batch.column("id_b"),
                    pa.array(est, type=pa.float64()),
                    pa.array(lb, type=pa.float64()),
                    pa.array(ub, type=pa.float64()),
                    pa.array(sh.astype(np.int32), type=pa.int32()),
                    pa.array(ph.astype(np.int32), type=pa.int32()),
                    pa.array((est >= cfg.jaccard_verify) & text_ok),
                    pa.array((sh <= cfg.simhash_max_hamming) & text_ok),
                    pa.array(
                        ph <= cfg.phash_max_hamming
                        if cfg.phash_max_hamming >= 0
                        else np.zeros(n, dtype=bool)
                    ),
                ],
                names=[
                    "id_a", "id_b", "jaccard_est", "jaccard_lb",
                    "jaccard_ub", "simhash_hamming", "phash_hamming",
                    "match_caption", "match_simhash", "match_phash",
                ],
            )

    return gen


def verify_pairs(
    candidates: DataFrame, signatures: DataFrame, cfg: DedupConfig = FROZEN
) -> DataFrame:
    """Score candidate (id64) pairs on all channels; keep any-channel
    matches. Input ids and output ids are the internal int64 keys."""
    sa = signatures.select(
        F.col("id64").alias("id_a"),
        F.col("sig").alias("sig_a"),
        F.col("simhash").alias("sim_a"),
        F.col("phash").alias("ph_a"),
    )
    sb = signatures.select(
        F.col("id64").alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("simhash").alias("sim_b"),
        F.col("phash").alias("ph_b"),
    )
    # join 1 is exchange-free (candidates arrive hash-partitioned by
    # id_a from the candidates stage; signatures by id64 — see
    # candidate_pairs/compute_signatures layout notes). Join 2 must
    # move the payload-carrying pair rows by id_b; force the shuffled
    # hash join so that side is only HASHED, never sorted — the SMJ
    # the planner picks statically sorts ~1 KB rows (two sig payloads)
    # and is bandwidth-bound exactly where the multi-core leg is
    # weakest (guide §3.1: build side = the fixed-width signature
    # table, bounded per partition).
    joined = candidates.join(sa, "id_a").join(sb.hint("SHUFFLE_HASH"), "id_b")
    scored = joined.mapInArrow(_verify_arrow(cfg), VERIFY_SCHEMA)
    return scored.filter(
        F.col("match_caption") | F.col("match_simhash") | F.col("match_phash")
    )


def confirm_spans(
    verified: DataFrame, corpus: DataFrame, cfg: DedupConfig = FROZEN,
    margin: float = 0.1,
) -> DataFrame:
    """Exact suffix-array LCS confirmation for borderline caption pairs.

    Only pairs with |jaccard_est − threshold| < margin re-fetch their
    captions (a tiny fraction), so the expensive exact check never
    touches the full corpus. Adds `lcs_len` and `lcs_frac` columns.
    Operates on string-id verified pairs (pipeline boundary schema).
    """
    from ..kernels.suffix import lcs_batch

    border = verified.filter(
        F.abs(F.col("jaccard_est") - F.lit(cfg.jaccard_verify)) < margin
    )
    caps = corpus.select("image_id", "caption")
    ca = caps.select(F.col("image_id").alias("id_a"), F.col("caption").alias("cap_a"))
    cb = caps.select(F.col("image_id").alias("id_b"), F.col("caption").alias("cap_b"))
    j = border.join(ca, "id_a").join(cb, "id_b")

    schema = "id_a string, id_b string, lcs_len int, lcs_frac double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = lcs_batch(pdf["cap_a"].tolist(), pdf["cap_b"].tolist())
            max_len = np.maximum(
                pdf["cap_a"].str.len().to_numpy(),
                pdf["cap_b"].str.len().to_numpy(),
            ).clip(min=1)
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "lcs_len": lens.astype(np.int32),
                    "lcs_frac": lens / max_len,
                }
            )

    spans = j.mapInPandas(gen, schema)
    return verified.join(spans, ["id_a", "id_b"], "left")
