"""Batch shingling: caption char-k shingles and whitespace tokens.

All functions are vectorized across an Arrow/pandas batch: captions are
concatenated into one uint8 buffer, shingles are sliding windows over
that buffer with row-boundary masking — no per-row Python in the hot
path. The reference's typed `update()` overloads
(theta/UpdatableThetaSketch.java:257-375) canonicalize input to bytes
before hashing; our analog is `normalize_captions` + UTF-8 encoding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import hash64, hash_bytes_batch, mix64, seed_mix


def normalize_captions(captions: pd.Series) -> pd.Series:
    """NFC-normalize, casefold, collapse whitespace."""
    s = captions.fillna("").astype(str)
    s = s.str.normalize("NFC").str.casefold()
    return s.str.replace(r"\s+", " ", regex=True).str.strip()


def _flatten_utf8(strings: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate UTF-8 bytes of N strings → (data, starts, lens).

    Fast path: one pyarrow conversion — the Arrow string array IS the
    flat utf-8 buffer + offsets, built in C (~5x the pandas per-row
    encode+join). Falls back to the pandas path on exotic inputs."""
    try:
        import pyarrow as pa

        arr = pa.array(strings, type=pa.large_utf8(), from_pandas=True)
        if arr.null_count == 0 and arr.offset == 0:
            bufs = arr.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64)[: len(arr) + 1]
            total = int(offsets[-1])
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)[:total]
                if bufs[2] is not None
                else np.empty(0, np.uint8)
            )
            return data, offsets[:-1].copy(), np.diff(offsets)
    except Exception:  # exotic inputs (mixed dtypes): pandas fallback
        pass
    encoded = strings.str.encode("utf-8")
    lens = encoded.str.len().to_numpy(dtype=np.int64)
    data = np.frombuffer(b"".join(encoded.tolist()), dtype=np.uint8)
    starts = np.zeros(len(lens), dtype=np.int64)
    if len(lens) > 1:
        starts[1:] = np.cumsum(lens[:-1])
    return data, starts, lens


def char_shingle_hashes(
    captions: pd.Series, k: int = 5, seed: int = 9001, bits: int = 63
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded hashes of all char-k shingles in a batch of captions.

    Returns (hashes, rows int64[M]) where rows[i] is the batch row
    index the i-th shingle belongs to. bits=63 (default) returns
    non-negative int64 (reference `hash[0] >>> 1` convention); bits=31
    returns non-negative int32 — the pipeline's narrow lane, which
    halves the memory traffic of every downstream sort/sketch (identity
    is hash equality in the reference too, so 31-bit identity only adds
    a ~k²/2³¹ per-row collision term, far below estimator noise).
    Rows shorter than k chars contribute one whole-string shingle;
    empty rows contribute nothing. Shingles are byte windows of the
    UTF-8 encoding (k <= 8 packs a window into one uint64 before
    hashing).
    """
    n = len(captions)
    if n == 0:
        dt = np.int64 if bits == 63 else np.int32
        return np.empty(0, dt), np.empty(0, np.int64)
    data, starts, lens = _flatten_utf8(captions)
    return char_shingle_hashes_flat(data, starts, lens, k, seed, bits)


def char_shingle_hashes_flat(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray,
    k: int = 5, seed: int = 9001, bits: int = 63,
) -> tuple[np.ndarray, np.ndarray]:
    """char_shingle_hashes over a pre-flattened utf-8 buffer (the
    signature stage flattens once and shares the buffer with the token
    path)."""
    if k > 8:
        raise ValueError("char_shingle_hashes supports k <= 8 (packed uint64)")
    if bits not in (31, 63):
        raise ValueError("bits must be 31 or 63")
    dt = np.int64 if bits == 63 else np.int32
    shift = np.uint64(64 - bits)
    n = len(starts)
    if n == 0:
        return np.empty(0, dt), np.empty(0, np.int64)
    total = len(data)
    row_of_pos = np.repeat(np.arange(n, dtype=np.int64), lens)

    out_h: list[np.ndarray] = []
    out_r: list[np.ndarray] = []

    if total >= k:
        win = np.lib.stride_tricks.sliding_window_view(data, k)  # (total-k+1, k)
        # valid window: start and end land in the same caption
        valid = row_of_pos[: total - k + 1] == row_of_pos[k - 1 :]
        # also require the row to be long enough (>= k)
        packed = np.zeros(win.shape[0], dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                packed = (packed << np.uint64(8)) | win[:, j].astype(np.uint64)
        out_h.append((hash64(packed[valid], seed) >> shift).astype(dt))
        out_r.append(row_of_pos[: total - k + 1][valid])

    short = (lens > 0) & (lens < k)
    if short.any():
        idx = np.nonzero(short)[0]
        h = hash_bytes_batch(data, starts[idx], lens[idx], seed)
        out_h.append((h >> shift).astype(dt))
        out_r.append(idx.astype(np.int64))

    if not out_h:
        return np.empty(0, dt), np.empty(0, np.int64)
    hashes = np.concatenate(out_h)
    rows = np.concatenate(out_r)
    order = np.argsort(rows, kind="stable")
    return hashes[order], rows[order]


def token_hashes(
    captions: pd.Series, seed: int = 9001
) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hashes of whitespace tokens → (hashes uint64[M], rows int64[M])."""
    n = len(captions)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    tok_lists = captions.fillna("").astype(str).str.split()
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    flat = [t for toks in tok_lists for t in toks]
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    if not flat:
        return np.empty(0, np.uint64), rows
    data, starts, lens = _flatten_utf8(pd.Series(flat))
    return hash_bytes_batch(data, starts, lens, seed), rows


def token_hashes_spacesep(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int = 9001
) -> tuple[np.ndarray, np.ndarray]:
    """token_hashes over a pre-flattened utf-8 buffer whose rows are
    ALREADY whitespace-normalized (single 0x20 separators, stripped —
    normalize_captions' postcondition, so a 0x20 scan and str.split()
    agree exactly; multibyte UTF-8 never contains 0x20). Skips the
    per-row Python split + re-encode of the generic path."""
    n = len(starts)
    total = len(data)
    if n == 0 or total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    is_sep = data == np.uint8(0x20)
    prev_sep = np.empty(total, dtype=bool)
    prev_sep[0] = True
    prev_sep[1:] = is_sep[:-1]
    prev_sep[starts[lens > 0]] = True  # a row start begins a token
    tok_start = np.flatnonzero((~is_sep) & prev_sep)
    next_sep = np.empty(total, dtype=bool)
    next_sep[-1] = True
    next_sep[:-1] = is_sep[1:]
    row_last = starts + lens - 1
    next_sep[row_last[lens > 0]] = True  # a row end terminates a token
    tok_end = np.flatnonzero((~is_sep) & next_sep)
    tok_lens = tok_end - tok_start + 1
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)[tok_start]
    from .hashing import hash_bytes_batch as _hbb

    return _hbb(data, tok_start, tok_lens, seed), rows


def ngram_token_hashes(
    captions: pd.Series, n_gram: int, seed: int = 9001
) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of word n-grams (rolling combine of token hashes)."""
    th, rows = token_hashes(captions, seed)
    if n_gram <= 1 or len(th) == 0:
        return th, rows
    m = len(th)
    if m < n_gram:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    acc = th[: m - n_gram + 1].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n_gram):
            acc = mix64(acc ^ th[j : m - n_gram + 1 + j])
        acc = mix64(acc ^ seed_mix(seed + n_gram))
    valid = rows[: m - n_gram + 1] == rows[n_gram - 1 :]
    return acc[valid], rows[: m - n_gram + 1][valid]
