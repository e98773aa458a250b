"""Signature map stage: corpus rows → sketch columns, one Arrow pass.

Each batch computes, fully vectorized (no per-row Python):
 - kmv_sig: bottom-k KMV/Theta signature of caption char-k shingles
   (reference T1, theta/HeapQuickSelectSketch.java:233-261 semantics)
 - bands: LSH band keys = 32 caption bands (OPH MinHash b=32 r=8) +
   6 pHash block-pair keys (C(4,2) combinations of the four 16-bit
   blocks; any error pattern confined to <=2 blocks is guaranteed a
   candidate — covers all Hamming<=2; 3-8 bit errors are probabilistic)
 - simhash: 64-bit Charikar signature over caption tokens
 - n_shingles: exact distinct shingle count (exact while < k, per the
   Theta sketch's exact mode)

This is the only stage that reads captions/bytes; everything after it
moves only ids + fixed-size sketch columns across shuffles — at 100 TB
that is the difference between shuffling terabytes and gigabytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN
from ..kernels import kmv
from ..kernels.hashing import mix64, seed_mix
from ..kernels.minhash import band_hashes, oph_signature_matrix
from ..kernels.shingle import char_shingle_hashes, normalize_captions, token_hashes
from ..kernels.simhash import simhash_batch

SIG_SCHEMA = (
    "image_id string, kmv_sig array<bigint>, bands array<bigint>, "
    "pbands array<bigint>, simhash bigint, phash bigint, "
    "n_shingles int, n_tokens int"
)


_BLOCK_PAIRS = ((0, 1), (2, 3), (0, 2), (1, 3), (0, 3), (1, 2))


def phash_band_keys(phash: np.ndarray, n_bands: int, seed: int) -> np.ndarray:
    """int64[n, 6]: one key per *pair* of 16-bit pHash blocks.

    Keys are the C(4,2)=6 two-block combinations of the four 16-bit
    blocks, so any error pattern confined to <= 2 blocks (covers all
    Hamming <= 2 and most realistic re-encode patterns, measured p99=4
    concentrated in low-order DCT bits) leaves the complementary pair
    intact — guaranteed detection. 32-bit key space keeps random/skew
    collisions ~n²/2^32 per key even on the correlated DCT-sign
    distribution of natural/synthetic images, where single 16-bit
    blocks measured 17M collision pairs on a 200k corpus.
    n_bands <= 0 disables the channel (text-only tables).
    """
    ph = np.asarray(phash, dtype=np.int64).astype(np.uint64)
    if n_bands <= 0:
        return np.empty((len(ph), 0), dtype=np.int64)
    blocks = [(ph >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)]
    out = np.empty((len(ph), len(_BLOCK_PAIRS)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        s = seed_mix(seed + 7777)
        for idx, (i, j) in enumerate(_BLOCK_PAIRS):
            key = (blocks[i] << np.uint64(16)) | blocks[j]
            out[:, idx] = mix64(
                key ^ (np.uint64(idx) * np.uint64(0xD1B54A32D192ED03)) ^ s
            )
    return (out >> np.uint64(1)).astype(np.int64)


def _signature_batches(cfg: DedupConfig):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            norm = normalize_captions(pdf["caption"])
            h, rows = char_shingle_hashes(norm, cfg.shingle_k, cfg.seed)

            kmv_sigs = kmv.bottom_k_batch(h, rows, n, cfg.kmv_k)
            n_shingles = np.zeros(n, dtype=np.int32)
            if len(rows):
                uniq = pd.DataFrame({"r": rows, "h": h}).drop_duplicates()
                cnt = uniq.groupby("r").size()
                n_shingles[cnt.index.to_numpy()] = cnt.to_numpy()

            mat, nonempty = oph_signature_matrix(h, rows, n, cfg.minhash_n, cfg.seed)
            cap_bands = band_hashes(mat, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)
            if cfg.phash_bands > 0:
                ph_bands = phash_band_keys(
                    pdf["phash"].to_numpy(np.int64), cfg.phash_bands, cfg.seed
                )
            else:  # text-only tables: no image channel
                ph_bands = np.empty((n, 0), dtype=np.int64)

            th, trows = token_hashes(norm, cfg.seed)
            sh = simhash_batch(th, trows, n)
            n_tokens = np.zeros(n, dtype=np.int32)
            if len(trows):
                tc = pd.Series(trows).value_counts()
                n_tokens[tc.index.to_numpy()] = tc.to_numpy()

            empty = np.empty(0, np.int64)
            bands_col = [cap_bands[i] if nonempty[i] else empty for i in range(n)]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "kmv_sig": kmv_sigs,
                    "bands": bands_col,
                    "pbands": list(ph_bands),
                    "simhash": sh,
                    "phash": pdf["phash"].to_numpy(np.int64),
                    "n_shingles": n_shingles,
                    "n_tokens": n_tokens,
                }
            )

    return gen


def compute_signatures(corpus: DataFrame, cfg: DedupConfig = FROZEN) -> DataFrame:
    """corpus (input_hint schema) → signature table.

    Column pruning matters: select only what the kernel reads so the
    parquet scan never materializes `bytes` (check ReadSchema in
    .explain — the 100 TB of pixels stays on disk).
    """
    cols = ["image_id", "caption"]
    if "phash" in corpus.columns:
        slim = corpus.select(*cols, "phash")
    else:
        slim = corpus.select(*cols, F.lit(0).cast("bigint").alias("phash"))
    # Input splits follow file layout (maxPartitionBytes), which for a
    # byte-heavy corpus can mean 1-2 splits of the *projected* columns —
    # starving the CPU-bound kernel. Re-spread the slim projection (a
    # few MB of captions, never the pixels) across all cores.
    par = slim.sparkSession.sparkContext.defaultParallelism
    return slim.repartition(par).mapInPandas(_signature_batches(cfg), SIG_SCHEMA)


def explode_bands(signatures: DataFrame) -> DataFrame:
    """(image_id, band_key, is_phash) — one row per LSH band, tagged
    with its channel so the skew cap can differ per channel."""
    cap = signatures.select(
        "image_id",
        F.explode("bands").alias("band_key"),
        F.lit(False).alias("is_phash"),
    )
    ph = signatures.select(
        "image_id",
        F.explode("pbands").alias("band_key"),
        F.lit(True).alias("is_phash"),
    )
    return cap.unionByName(ph)
