"""Streaming smoke (FIXTURES.md F6): incremental KMV sketch state over
the driver's events table via foreachBatch, with checkpoint/resume —
estimates must match batch-mode exact distinct counts."""

import os
import shutil

import pytest
from pyspark.sql import functions as F


def test_incremental_signatures_match_batch(spark, smoke_sf_dir, tmp_path):
    from datasketches_java_spark.streaming.incremental import (
        read_state_estimates,
        run_incremental_signatures,
    )

    events = spark.read.parquet(f"{smoke_sf_dir}/events.parquet")
    src = str(tmp_path / "stream_src")
    # split into 3 files so the stream sees multiple micro-batches
    events.repartition(3).write.parquet(src)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state, exist_ok=True)
    run_incremental_signatures(
        spark, src, state, ckpt, group_col="event_type", value_col="user_id", k=256
    )

    est = read_state_estimates(state, 256).set_index("group")
    exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .toPandas()
        .set_index("event_type")["n"]
    )
    for g, true in exact.items():
        assert est.loc[g, "distinct_lb"] <= true <= est.loc[g, "distinct_ub"]

    # resume: nothing new to process, state unchanged
    before = est["distinct_est"].to_dict()
    run_incremental_signatures(
        spark, src, state, ckpt, group_col="event_type", value_col="user_id", k=256
    )
    after = read_state_estimates(state, 256).set_index("group")["distinct_est"].to_dict()
    assert before == after
