"""LSH candidate generation — skew-aware, single-shuffle band grouping.

Band-key groups follow a power law at web scale (SURVEY.md §4 custom
work #1); a naive self-join on band_key turns one hot band of size g
into g² rows. Two-tier strategy, the analog of the reference's
quantile-driven Partitioner idea (partitions/Partitioner.java:113-166):

 1. normal bands (group size <= cap): all within-group pairs.
 2. hot bands (> cap): pair every member with the group's minimum
    member (a star). This preserves *connectivity* — the clustering
    stage still merges the whole group — while emitting O(g) instead
    of O(g²) pairs, and keeps the dup graph's diameter at 2 so the
    pointer-jumping clustering loop converges in O(1) rounds (a
    sorted-neighbor chain would add log₂(cap) rounds).

Physical plan: ONE hash repartition on band_key, then an Arrow map
stage lexsorts its partition in NumPy (grouping sort in the process-
parallel Python worker, not the JVM) and emits pairs with the cap/star
policy vectorized. The round-1 design did the same work with four
shuffles (count, anti-join, self-join, window); this shape moves each
band row through the JVM exactly once — the property that matters at
100 TB, where the exploded band table is the largest shuffle of the
whole pipeline.

Per-channel caps ride on the key's sign (>=0 caption MinHash, <0 pHash
block pairs — see operators/signatures.py), so no flag column travels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN

PAIR_SCHEMA = "id_a bigint, id_b bigint"


def _triangular_pairs(
    ids: np.ndarray, starts: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All within-group (i<j) pairs for groups laid out contiguously in
    `ids`. Fully vectorized triangular-index decode (no per-group loop)."""
    m = sizes * (sizes - 1) // 2
    total = int(m.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), m)
    t = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    n = sizes[gidx].astype(np.int64)
    # i = floor((2n-1 - sqrt((2n-1)² - 8t)) / 2); exact in float64 for
    # n <= ~1e6, with an integer fix-up for boundary rounding
    disc = (2 * n - 1).astype(np.float64) ** 2 - 8 * t.astype(np.float64)
    i = ((2 * n - 1) - np.sqrt(disc)).astype(np.int64) // 2
    # fix-up: ensure S(i) <= t < S(i+1), S(i) = i*n - i(i+1)/2
    s_i = i * n - i * (i + 1) // 2
    i = np.where(t < s_i, i - 1, i)
    s_i = i * n - i * (i + 1) // 2
    s_next = (i + 1) * n - (i + 1) * (i + 2) // 2
    i = np.where(t >= s_next, i + 1, i)
    s_i = i * n - i * (i + 1) // 2
    j = t - s_i + i + 1
    base = starts[gidx]
    return ids[base + i], ids[base + j]


def _star_pairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Min-member star over one hot group (O(g) pairs, connects the
    whole group at graph diameter 2). ids sorted → ids[0] is the hub."""
    if len(ids) < 2:
        e = np.empty(0, np.int64)
        return e, e
    return np.broadcast_to(ids[0], len(ids) - 1).copy(), ids[1:]


def _emit(
    keys: np.ndarray, ids: np.ndarray, cap_caption: int, cap_phash: int,
) -> pd.DataFrame | None:
    """Pairs for a run of complete groups (keys sorted, ids sorted
    within each key)."""
    if len(keys) == 0:
        return None
    boundary = np.ones(len(keys), dtype=bool)
    boundary[1:] = keys[1:] != keys[:-1]
    starts = np.nonzero(boundary)[0]
    sizes = np.diff(np.append(starts, len(keys)))
    multi = sizes >= 2
    if not multi.any():
        return None
    starts, sizes = starts[multi], sizes[multi]
    caps = np.where(keys[starts] < 0, cap_phash, cap_caption)

    normal = sizes <= caps
    a1, b1 = _triangular_pairs(ids, starts[normal], sizes[normal])

    hot = ~normal
    stars_a, stars_b = [], []
    for s, g in zip(starts[hot], sizes[hot]):
        ca, cb = _star_pairs(ids[s : s + g])
        stars_a.append(ca)
        stars_b.append(cb)
    if stars_a:
        a2 = np.concatenate([a1] + stars_a)
        b2 = np.concatenate([b1] + stars_b)
    else:
        a2, b2 = a1, b1
    if len(a2) == 0:
        return None
    keep = a2 != b2  # same id64 twice under one key (band collision)
    return pd.DataFrame({"id_a": a2[keep], "id_b": b2[keep]})


def _pair_gen(cfg: DedupConfig):
    cap_c, cap_p = cfg.band_group_cap, cfg.phash_band_cap

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # buffer the whole partition, lexsort in NumPy, emit once: the
        # JVM ships unsorted hash-partitioned rows and the (process-
        # parallel, scalable) Python worker does the grouping sort —
        # measurably cheaper than sortWithinPartitions on slow-memory
        # single-JVM hosts. (An Arrow-native mapInArrow variant of this
        # stage measured consistently ~25% SLOWER than the pandas
        # transport on interleaved same-session A/B reps — the pandas
        # batch path is the faster one here, not just the idiomatic
        # one.) Memory bound = one partition of 12-byte rows (size it
        # via the repartition width upstream; ~256 MB partitions at
        # web scale).
        ks, ids = [], []
        for pdf in batches:
            if len(pdf):
                ks.append(pdf["band_key"].to_numpy(np.int32))
                ids.append(pdf["id64"].to_numpy(np.int64))
        if not ks:
            return
        k = np.concatenate(ks)
        i = np.concatenate(ids)
        order = np.lexsort((i, k))
        out = _emit(k[order], i[order], cap_c, cap_p)
        if out is None:
            return
        # local dedup before the global distinct: the same (a, b) pair
        # re-emitted by several band keys of one partition collapses
        # here in one vectorized pass, shrinking the distinct shuffle.
        # lexsort + boundary mask instead of a structured-dtype
        # np.unique: the void16 comparator is ~4x slower than two
        # int64 sort passes
        a = out["id_a"].to_numpy(np.int64)
        b = out["id_b"].to_numpy(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        yield pd.DataFrame({"id_a": a[first], "id_b": b[first]})

    return gen


def candidate_pairs(band_rows: DataFrame, cfg: DedupConfig = FROZEN) -> DataFrame:
    """(id64, band_key) rows → distinct candidate (id_a < id_b) pairs.

    pHash blocks are coarse, so their cap is much tighter than the
    caption MinHash bands' (sign of the key selects the cap).

    Round-6 plan shape (guide §4.1 "pass only what the function
    needs", measured at c4/1M: stage 23.1s → ~19s):

    - SINGLETON-BAND FILTER before the Python boundary: the dominant
      stage cost is not the shuffle (4.7s) but JVM→Python Arrow
      serialization of the band rows (+11.9s for 38M rows at c4, and
      it scales ~2x not 4x across cores — it is bus-bound). Most band
      keys occur exactly once and can never produce a pair, so a
      window count over the SAME band_key partitioning (no extra
      exchange; one in-partition sort) drops them JVM-side — 38M →
      10.3M boundary rows on the 1M corpus. Pair output is provably
      identical: every multi-member group still crosses whole.
    - pairs repartition by id_a BEFORE the distinct: hash-partitioning
      on a subset of the distinct keys satisfies the aggregation's
      required distribution, so the distinct runs with no further
      exchange — and the stage's cached OUTPUT is then already
      partitioned the way the verify stage's first join (on id_a)
      needs it, removing that stage's candidate-side exchange
      (the same one-shuffle-saves-two layout trick
      compute_signatures uses for id64).
    """
    from pyspark.sql import Window

    from ..session import plan_width

    spark = band_rows.sparkSession
    par = plan_width(spark)
    grouped = band_rows.repartition(par, "band_key")
    w = Window.partitionBy("band_key")
    flt = (
        grouped.withColumn("__g", F.count("*").over(w))
        .filter(F.col("__g") >= 2)
        .drop("__g")
    )
    pairs = flt.mapInPandas(_pair_gen(cfg), PAIR_SCHEMA)
    return pairs.repartition(par, "id_a").distinct()
