"""SimHash — Charikar random-hyperplane signatures over token vectors.

Not present in the reference (SURVEY.md §2a note); grounded in
Charikar, "Similarity estimation techniques from rounding algorithms"
(STOC 2002). 64-bit signature: for each token hash, each bit votes ±1;
signature bit = sign of the vote sum. Hamming distance approximates
angular distance between token multisets.
"""

from __future__ import annotations

import numpy as np

from .hashing import popcount64


def simhash_batch(
    token_h: np.ndarray, rows: np.ndarray, n_rows: int, weights: np.ndarray | None = None
) -> np.ndarray:
    """int64[n_rows] simhash from (token hash, row) pairs. Rows with no
    tokens get signature 0."""
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    if len(token_h):
        rows = np.asarray(rows, dtype=np.int64)
        order = np.argsort(rows, kind="stable")
        th_s, rows_s = np.asarray(token_h, dtype=np.uint64)[order], rows[order]
        starts = np.nonzero(np.r_[True, rows_s[1:] != rows_s[:-1]])[0]
        if weights is not None:
            bits = np.unpackbits(
                th_s.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1
            )  # (M, 64) uint8, MSB first
            w = np.asarray(weights, dtype=np.float64)[order]
            votes = (bits.astype(np.float64) * 2 - 1) * w[:, None]
            # segment-sum per row (reduceat: ~30x faster than add.at)
            sums = np.add.reduceat(votes, starts, axis=0)
            acc = acc.astype(np.float64)
            acc[rows_s[starts]] = sums
        else:
            # per-bit 1-D reduceat on the raw uint64 hashes: stays in
            # the fast ufunc inner loop and never materializes an
            # (M, 64) wide matrix (both the int64 astype and the
            # dtype=-widened 2-D reduceat measured 5-100x slower)
            ones = np.empty((len(starts), 64), dtype=np.int64)
            one = np.uint64(1)
            for b in range(64):
                ones[:, 63 - b] = np.add.reduceat(
                    (th_s >> np.uint64(b)) & one, starts
                ).astype(np.int64)
            seg_len = np.diff(np.append(starts, len(rows_s)))
            acc[rows_s[starts]] = 2 * ones - seg_len[:, None]
    out_bits = (acc > 0).astype(np.uint8)
    packed = np.packbits(out_bits, axis=1)  # MSB-first bytes
    return packed.view(">u8").reshape(-1).astype(np.uint64).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance of two int64 arrays."""
    x = np.asarray(a).astype(np.uint64) ^ np.asarray(b).astype(np.uint64)
    return popcount64(x)
