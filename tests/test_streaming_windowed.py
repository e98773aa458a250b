"""Watermarked windowed aggregation + applyInPandasWithState lanes
(streaming/windowed.py).

Late-data determinism trick: each lane runs with `availableNow` against
a file source, so a "micro-batch" is a separate drain of the backlog
with the SAME checkpoint — the watermark / state-store contents persist
across drains exactly like a long-running query across triggers, but
with fully deterministic batch boundaries (no reliance on file mtime
ordering within one drain).
"""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(path)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    from datasketches_java_spark.streaming.windowed import windowed_event_counts

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two 1h windows; watermark advances to 12:00-0:30 = 11:30,
    # so window [10:00, 11:00) finalizes and is emitted
    _write_events(
        spark,
        src,
        [
            Row(ts=_ts("2024-01-01T10:05:00"), user_id=1, event_type="view"),
            Row(ts=_ts("2024-01-01T10:10:00"), user_id=2, event_type="view"),
            Row(ts=_ts("2024-01-01T10:10:00"), user_id=2, event_type="view"),
            Row(ts=_ts("2024-01-01T12:00:00"), user_id=9, event_type="view"),
        ],
    )
    windowed_event_counts(
        spark, src, sink, ckpt, window_len="1 hour", watermark="30 minutes"
    )
    out1 = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(sink, "*.parquet"))],
        ignore_index=True,
    )
    w10 = out1[out1["window_start"] == _ts("2024-01-01T10:00:00")]
    assert len(w10) == 1
    assert int(w10["n_events"].iloc[0]) == 3
    assert int(w10["approx_users"].iloc[0]) == 2  # HLL exact at tiny n

    # batch 2: one event at 10:20 — BEYOND the 11:30 watermark, must be
    # dropped; a fresh event at 13:30 advances the watermark to 13:00,
    # finalizing [11:00-12:00) (empty → no row) and [12:00-13:00)
    _write_events(
        spark,
        src,
        [
            Row(ts=_ts("2024-01-01T10:20:00"), user_id=3, event_type="view"),
            Row(ts=_ts("2024-01-01T13:30:00"), user_id=4, event_type="view"),
        ],
    )
    windowed_event_counts(
        spark, src, sink, ckpt, window_len="1 hour", watermark="30 minutes"
    )
    out2 = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(sink, "*.parquet"))],
        ignore_index=True,
    )
    # the 10:00 window was emitted once and NOT re-emitted/updated by
    # the late row (dropped), and the 12:00 window finalized with its
    # single on-time event
    w10b = out2[out2["window_start"] == _ts("2024-01-01T10:00:00")]
    assert len(w10b) == 1 and int(w10b["n_events"].iloc[0]) == 3
    w12 = out2[out2["window_start"] == _ts("2024-01-01T12:00:00")]
    assert len(w12) == 1 and int(w12["n_events"].iloc[0]) == 1


def test_windowed_counts_on_driver_events(spark, smoke_sf_dir, tmp_path):
    """Full drain of the driver's events table: every FINALIZED window
    (end < max ts - watermark would still hold rows back; availableNow
    emits windows the final watermark passed) must match batch-mode
    groupBy exactly."""
    from datasketches_java_spark.streaming.windowed import windowed_event_counts

    events = spark.read.parquet(f"{smoke_sf_dir}/events.parquet")
    src = str(tmp_path / "esrc")
    events.repartition(2).write.parquet(src)
    sink = str(tmp_path / "esink")
    ckpt = str(tmp_path / "eckpt")
    windowed_event_counts(
        spark, src, sink, ckpt, window_len="1 hour", watermark="10 minutes",
        max_files_per_trigger=2,
    )
    got = (
        pd.concat(
            [pd.read_parquet(f) for f in glob.glob(os.path.join(sink, "*.parquet"))],
            ignore_index=True,
        )
        .set_index(["window_start", "event_type"])["n_events"]
        .sort_index()
    )
    exact = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .toPandas()
        .set_index(["ws", "event_type"])["n"]
        .sort_index()
    )
    assert len(got) > 0
    for idx, n in got.items():
        assert exact.loc[idx] == n


def test_running_distinct_state_matches_batch(spark, smoke_sf_dir, tmp_path):
    """applyInPandasWithState lane: after draining all micro-batches,
    each group's LAST emitted estimate equals the batch-mode KMV
    estimate over the whole table (KMV state is order-insensitive),
    and bounds contain the exact distinct count. A second drain with
    new files resumes from the checkpointed state store."""
    from datasketches_java_spark.streaming.windowed import running_distinct_by_group

    events = spark.read.parquet(f"{smoke_sf_dir}/events.parquet")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "ssrc")
    sink = str(tmp_path / "ssink")
    ckpt = str(tmp_path / "sckpt")
    half1.coalesce(1).write.mode("append").parquet(src)
    running_distinct_by_group(spark, src, sink, ckpt, k=256)
    half2.coalesce(1).write.mode("append").parquet(src)
    running_distinct_by_group(spark, src, sink, ckpt, k=256)

    out = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(sink, "*.parquet"))],
        ignore_index=True,
    )
    final = (
        out.sort_values("batch_id").groupby("event_type").tail(1).set_index("event_type")
    )
    exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .toPandas()
        .set_index("event_type")["n"]
    )
    assert set(final.index) == set(exact.index)
    for g, true in exact.items():
        assert final.loc[g, "distinct_lb"] <= true <= final.loc[g, "distinct_ub"]

    # state-store resume: totals reflect BOTH halves, not just the last
    from datasketches_java_spark.functions.sketch_udfs import kmv_distinct_agg

    batch = kmv_distinct_agg(events, "event_type", "user_id", k=256).toPandas()
    batch = batch.set_index("event_type")["distinct_est"]
    for g in exact.index:
        assert int(round(batch.loc[g])) == int(final.loc[g, "distinct_est"])
