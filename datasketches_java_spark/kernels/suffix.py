"""Suffix-array substring matching for exact near-dup span detection.

Not in the reference (SURVEY.md §2a note); grounded in Manber & Myers,
"Suffix arrays: a new method for on-line string searches" (SODA 1990)
— prefix-doubling construction, vectorized with NumPy argsort — and
Kasai et al. (CPM 2001) for the LCP array. Used in pair verification:
the longest common substring of two captions is the max LCP between
adjacent suffixes originating from different strings.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence via prefix doubling, O(n log^2 n)."""
    s = np.asarray(s, dtype=np.int64)
    n = len(s)
    if n == 0:
        return np.empty(0, np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n:
        # second key: rank of suffix i+k (or -1 past the end)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        r1, r2 = rank[sa], second[sa]
        new_rank = np.zeros(n, dtype=np.int64)
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank[sa] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i-1]); lcp[0]=0."""
    s = np.asarray(s, dtype=np.int64)
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.zeros(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> tuple[int, int, int]:
    """(length, start_in_a, start_in_b) of the longest common substring."""
    if not a or not b:
        return 0, 0, 0
    ab = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    na = len(ab)
    # separator below any byte value so it never extends a match
    s = np.concatenate([ab + 2, np.array([1], dtype=np.int64), bb + 2])
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    from_a = sa < na
    from_a_prev = np.zeros(len(sa), dtype=bool)
    from_a_prev[1:] = from_a[:-1]
    cross = np.zeros(len(sa), dtype=bool)
    cross[1:] = from_a[1:] != from_a[:-1]
    if not cross.any():
        return 0, 0, 0
    cand = np.where(cross, lcp, 0)
    i = int(np.argmax(cand))
    best = int(cand[i])
    if best == 0:
        return 0, 0, 0
    p, q = int(sa[i]), int(sa[i - 1])
    a_pos, b_pos = (p, q) if p < na else (q, p)
    return best, a_pos, b_pos - na - 1


def lcs_batch(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """LCS byte-length per pair (verification batches)."""
    out = np.empty(len(a_list), dtype=np.int64)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        out[i] = longest_common_substring(a or "", b or "")[0]
    return out
