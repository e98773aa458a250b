"""Equi-weight partitioner tests (partitions/Partitioner.java port):
reference level math, exact-regime boundary oracle, multi-level
invariants, assignment consistency, and LIVE parity with the embedded
datasketches-java GenericPartitionBoundaries on the same stream."""

import math

import numpy as np
import pytest

from datasketches_java_spark.kernels.kll import KllDoubles
from datasketches_java_spark.operators.partitioner import (
    INCLUDE_BOTH,
    INCLUDE_UPPER,
    PartitionBound,
    _gpb,
    partition_boundaries,
    partition_boundaries_df,
    plan_levels,
    repartition_by_boundaries,
)


def test_plan_levels_matches_reference_math():
    # javadoc example scale: 1e9 items / 3M target -> guess=334
    assert plan_levels(10**9, 3_000_000, None, 100) == (2, 18)
    # single level when guess <= maxParts
    assert plan_levels(1000, None, 8, 64) == (1, 8)
    # deep: guess 334 with maxParts 5 -> ceil(log334/log5)=4, round(334^.25)=4
    n_lvl, pps = plan_levels(10**9, 3_000_000, None, 5)
    assert n_lvl == math.ceil(math.log(334) / math.log(5))
    assert pps == round(334 ** (1 / n_lvl))


def _brute_rows(values: np.ndarray, parts: int) -> list[PartitionBound]:
    """Position-math oracle for the exact regime (INCLUSIVE):
    boundary_p = sorted[ceil(p*n/P)], delta_1 = ceil(n/P),
    delta_p = ceil(pn/P) - ceil((p-1)n/P)."""
    s = np.sort(values)
    n = len(s)
    out = []
    for p in range(1, parts + 1):
        r_hi = -(-p * n // parts)
        r_lo = -(-(p - 1) * n // parts)
        up = float(s[r_hi - 1])
        lo = float(s[0]) if p == 1 else float(s[r_lo - 1])
        rows = r_hi if p == 1 else r_hi - r_lo
        rule = (
            (INCLUDE_UPPER if lo == up else INCLUDE_BOTH)
            if p == 1
            else INCLUDE_UPPER
        )
        out.append(PartitionBound(p, f"1.{p}", lo, up, rule, rows))
    return out


def test_single_level_exact_oracle(spark):
    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(1000.0, 200.0, 4003), 2)  # duplicates likely
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = partition_boundaries(df, "v", num_parts=8, k=1 << 13)
    expect = _brute_rows(vals, 8)
    assert len(rows) == 8
    for got, exp in zip(rows, expect):
        assert (got.part, got.level_part_id) == (exp.part, exp.level_part_id)
        assert got.lower == exp.lower and got.upper == exp.upper
        assert got.approx_rows == exp.approx_rows
        assert got.rule == exp.rule
    assert sum(r.approx_rows for r in rows) == len(vals)


def test_multi_level_invariants_and_assignment(spark):
    # distinct values => approx_rows equals the ACTUAL routed counts
    rng = np.random.default_rng(11)
    vals = rng.permutation(np.arange(5000, dtype=np.float64) * 1.25 + 3.0)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = partition_boundaries(
        df, "v", num_parts=16, max_parts_per_pass=4, k=1 << 13
    )
    assert len(rows) == 16
    assert all("," in r.level_part_id for r in rows)  # two-level ids
    assert sum(r.approx_rows for r in rows) == 5000
    # equi-weight: every partition within 2 of the ideal size
    for r in rows:
        assert abs(r.approx_rows - 5000 / 16) <= 2
    # tiling: monotone non-overlapping. INCLUDE_UPPER rows share the
    # previous upper as their (exclusive) lower; INCLUDE_BOTH rows open
    # a new range at its own min item, strictly above the previous
    # upper (Partitioner.java:221 uses the range sketch's getMinItem)
    for a, b in zip(rows, rows[1:]):
        if b.rule == INCLUDE_BOTH:
            assert b.lower > a.upper
        else:
            assert b.lower == a.upper
        assert b.upper >= b.lower
    # routed counts match approx_rows exactly (distinct values)
    routed = repartition_by_boundaries(df, "v", rows)
    counts = {
        r["__part"]: r["cnt"]
        for r in routed.groupBy("__part").count().withColumnRenamed("count", "cnt").collect()
    }
    for r in rows:
        assert counts.get(r.part, 0) == r.approx_rows
    # physical co-location: every part id lands wholly in ONE Spark
    # partition (range repartition over contiguous part ids may still
    # merge adjacent small parts, but never splits one — the property
    # the write side needs)
    from pyspark.sql import functions as F

    split = (
        routed.withColumn("pid", F.spark_partition_id())
        .groupBy("__part")
        .agg(F.countDistinct("pid").alias("np"))
        .agg(F.max("np"))
        .collect()[0][0]
    )
    assert split == 1


def test_heavy_ties_still_tile(spark):
    # one value spanning many cuts: deltas collapse, rules mark the
    # empty ranges, every row still lands in exactly one partition
    vals = np.concatenate([np.full(900, 5.0), np.array([1.0, 2.0, 9.0, 9.5])])
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = partition_boundaries(df, "v", num_parts=4, k=1 << 12)
    assert sum(r.approx_rows for r in rows) == len(vals)
    routed = repartition_by_boundaries(df, "v", rows)
    assert routed.count() == len(vals)
    total = sum(
        r["count"] for r in routed.groupBy("__part").count().collect()
    )
    assert total == len(vals)


def test_gpb_live_parity_with_java(spark):
    """Our _gpb vs the reference's own getPartitionBoundariesFromNumParts
    (GenericPartitionBoundaries) on the same stream, exact regime both
    sides: boundaries, natural ranks, and delta counts must be equal."""
    jvm = spark._jvm
    cmp_ = jvm.java.util.Comparator.naturalOrder()
    serde = jvm.org.apache.datasketches.common.ArrayOfStringsSerDe()
    try:
        jki = jvm.org.apache.datasketches.kll.KllItemsSketch.newHeapInstance(
            1024, cmp_, serde
        )
    except Exception:
        pytest.skip("KllItemsSketch(k) ctor unavailable")
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10**6, 1000)
    for v in vals:
        jki.update(f"{v:07d}")  # zero-padded: lexicographic == numeric
    incl = jvm.org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    gpb = jki.getPartitionBoundariesFromNumParts(7, incl)
    mine = KllDoubles(k=1024)
    mine.update_many(vals.astype(np.float64))
    b, nat, deltas = _gpb(mine, 7)
    jb = [float(x) for x in gpb.getBoundaries()]
    assert jb == [float(x) for x in b]
    assert list(gpb.getNaturalRanks()) == [int(x) for x in nat]
    assert list(gpb.getNumDeltaItems())[1:] == [int(x) for x in deltas]


def test_boundaries_df_schema(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in np.arange(100.0)], "v double"
    )
    rows = partition_boundaries(df, "v", num_parts=4, k=1 << 10)
    out = partition_boundaries_df(spark, rows)
    assert [f.name for f in out.schema.fields] == [
        "part", "level_part_id", "lower", "upper", "rule", "approx_rows",
    ]
    assert out.count() == 4
