"""Distributed Bloom-filter and Count-Min operators over the NumPy
kernels (kernels/bloom.py, kernels/countmin.py).

Both sketches are mergeable (Bloom: bitwise OR, BloomFilter.java:681;
Count-Min: elementwise add, CountMinSketch.java:365), so they follow
the canonical partial/final shape (SURVEY.md §1.1): one serialized
partial per Arrow batch → single-group merge → broadcast the compact
final sketch to the probe side. The build side never shuffles raw
rows — only O(sketch) bytes per batch cross the wire, which is the
whole point of a shuffle-reduction prefilter at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.bloom import BloomFilter, suggest_num_filter_bits, \
    suggest_num_hashes_from_size
from ..kernels.countmin import CountMinSketch


def bloom_build(df: DataFrame, key_col: str, max_distinct: int,
                target_fpp: float = 0.01, seed: int = 9001) -> DataFrame:
    """One-row DataFrame holding the serialized Bloom filter of
    xxhash64(key_col). Sized by the reference builder formulas."""
    m = suggest_num_filter_bits(max_distinct, target_fpp)
    h = suggest_num_hashes_from_size(max_distinct, m)
    keys = df.select(F.xxhash64(key_col).alias("k"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(m, h, seed)
        nonempty = False
        for pdf in batches:
            if len(pdf):
                bf.update(pdf["k"].to_numpy(np.int64).astype(np.uint64))
                nonempty = True
        if nonempty:
            yield pd.DataFrame({"sketch": [bf.serialize()]})

    partials = keys.mapInPandas(partial, "sketch binary")

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = BloomFilter.deserialize(pdf["sketch"].iloc[0])
        for b in pdf["sketch"].iloc[1:]:
            out = out.union(BloomFilter.deserialize(b))
        return pd.DataFrame({"sketch": [out.serialize()]})

    return (
        partials.withColumn("g", F.lit(1))
        .groupBy("g").applyInPandas(merge, "sketch binary")
        .select("sketch")
    )


def bloom_might_contain(
    probe: DataFrame, key_col: str, bloom_df: DataFrame
) -> DataFrame:
    """Rows of `probe` whose key the broadcast filter admits (no false
    negatives — the exact confirm join downstream sees every true
    match, just ~fpp·|probe| extra rows)."""
    cols = probe.columns
    with_k = probe.withColumn("__k", F.xxhash64(key_col)).crossJoin(
        F.broadcast(bloom_df)
    )

    schema = ", ".join(f"`{c}` {probe.schema[c].dataType.simpleString()}"
                       for c in cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if bf is None:
                bf = BloomFilter.deserialize(pdf["sketch"].iloc[0])
            ok = bf.query(pdf["__k"].to_numpy(np.int64).astype(np.uint64))
            yield pdf.loc[ok, cols]

    return with_k.mapInPandas(gen, schema)


def countmin_counts(
    items: DataFrame, item_col: str,
    num_hashes: int, num_buckets: int, seed: int = 9001,
) -> DataFrame:
    """(item, cm_count) for every distinct item: global Count-Min built
    via partial/final merge, then the distinct items are scored against
    the broadcast final sketch. Items are hashed with xxhash64 JVM-side
    (typed canonicalization, SURVEY §1.2)."""
    keys = items.select(
        F.col(item_col).alias("item"), F.xxhash64(item_col).alias("k")
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = CountMinSketch(num_hashes, num_buckets, seed)
        nonempty = False
        for pdf in batches:
            if len(pdf):
                cm.update(pdf["k"].to_numpy(np.int64).astype(np.uint64))
                nonempty = True
        if nonempty:
            yield pd.DataFrame({"sketch": [cm.serialize()]})

    partials = keys.select("k").mapInPandas(partial, "sketch binary")

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = CountMinSketch.deserialize(pdf["sketch"].iloc[0])
        for b in pdf["sketch"].iloc[1:]:
            out = out.merge(CountMinSketch.deserialize(b))
        return pd.DataFrame({"sketch": [out.serialize()]})

    merged = (
        partials.withColumn("g", F.lit(1))
        .groupBy("g").applyInPandas(merge, "sketch binary")
        .select("sketch")
    )

    distinct = keys.distinct().crossJoin(F.broadcast(merged))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cm is None:
                cm = CountMinSketch.deserialize(pdf["sketch"].iloc[0])
            est = cm.estimate(pdf["k"].to_numpy(np.int64).astype(np.uint64))
            yield pd.DataFrame({"item": pdf["item"], "cm_count": est})

    return distinct.mapInPandas(score, "item string, cm_count bigint")
