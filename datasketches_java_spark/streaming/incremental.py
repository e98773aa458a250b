"""Incremental signature building over a stream (Structured Streaming).

The sketch contract (mergeable union with identity — SURVEY.md §1.1) is
what makes incremental ingest correct: each micro-batch computes
signatures for its rows and unions per-group sketches into a running
state table, exactly like the reference's update→union lifecycle but
with Iceberg/parquet state instead of heap memory.

`run_incremental_signatures` wires: readStream (file source) →
foreachBatch( signature map → per-group KMV partials → merge with the
persisted state ) → atomic state replace + Spark checkpointing for
exactly-once resume. FIXTURES.md F6 smoke-tests it with the driver's
`events` table mapped to (image_id, caption).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_UPDATE_SEED
from ..functions.sketch_udfs import kmv_sketch_bytes_agg
from ..kernels import kmv


def merge_sketch_states(old: pd.DataFrame, new: pd.DataFrame, k: int) -> pd.DataFrame:
    """Union two (group, sketch) state tables (driver-/executor-neutral)."""
    merged: dict[str, np.ndarray] = {}
    for df in (old, new):
        for g, b in zip(df.iloc[:, 0], df["sketch"]):
            sig, kk = kmv.deserialize(bytes(b))
            if g in merged:
                merged[g] = kmv.union(merged[g], sig, k)
            else:
                merged[g] = sig
    return pd.DataFrame(
        {old.columns[0]: list(merged.keys()),
         "sketch": [kmv.serialize(s, k) for s in merged.values()]}
    )


def run_incremental_signatures(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str = "user_id",
    value_col: str = "event_type",
    k: int = 256,
    max_files_per_trigger: int = 1,
) -> None:
    """Stream parquet files from source_dir; maintain per-group KMV
    distinct sketches in state_dir. availableNow => drains the backlog
    then stops (resumable: the Spark checkpoint remembers progress)."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    state_path = os.path.join(state_dir, "kmv_state.parquet")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = (
            kmv_sketch_bytes_agg(
                batch_df.withColumn(group_col, F.col(group_col).cast("string")),
                group_col, value_col, k,
            )
            .toPandas()
        )
        if os.path.exists(state_path):
            old = pd.read_parquet(state_path)
            new = merge_sketch_states(old, new, k)
        tmp = state_path + f".tmp{batch_id}"
        new.to_parquet(tmp)
        os.replace(tmp, state_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_state_estimates(state_dir: str, k: int = 256) -> pd.DataFrame:
    """Distinct-count estimates from the persisted sketch state."""
    state = pd.read_parquet(os.path.join(state_dir, "kmv_state.parquet"))
    rows = []
    for g, b in zip(state.iloc[:, 0], state["sketch"]):
        sig, kk = kmv.deserialize(bytes(b))
        lb, est, ub = kmv.estimate_bounds(sig, kk, 2)
        rows.append((g, est, lb, ub))
    return pd.DataFrame(rows, columns=["group", "distinct_est", "distinct_lb", "distinct_ub"])
