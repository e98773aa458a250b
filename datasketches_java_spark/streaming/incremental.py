"""Incremental signature building over a stream (Structured Streaming).

The sketch contract (mergeable union with identity — SURVEY.md §1.1) is
what makes incremental ingest correct: each micro-batch computes
signatures for its rows and unions per-group sketches into a running
state table, exactly like the reference's update→union lifecycle but
with parquet/Iceberg state instead of heap memory.

`run_incremental_signatures` wires: readStream (file source) →
foreachBatch( signature map → per-group KMV partials → DISTRIBUTED
merge with the persisted state via grouped applyInPandas ) → versioned
state write + atomic CURRENT-pointer flip (the Iceberg snapshot
pattern) + Spark checkpointing for exactly-once resume. Nothing sketch-
sized ever passes through the driver — state merge scales with
executors, not driver memory. FIXTURES.md F6 smoke-tests it with the
driver's `events` table mapped to (image_id, caption).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketch_udfs import kmv_sketch_bytes_agg
from ..kernels import kmv

_CURRENT = "CURRENT"


def _current_state_path(state_dir: str) -> str | None:
    ptr = os.path.join(state_dir, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        rel = f.read().strip()
    path = os.path.join(state_dir, rel)
    return path if os.path.isdir(path) else None


def _flip_current(state_dir: str, version_name: str) -> None:
    """Atomic pointer flip (write tmp + rename), the snapshot-commit
    pattern; readers always see a complete state directory."""
    ptr = os.path.join(state_dir, _CURRENT)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(version_name)
    os.replace(tmp, ptr)


def merge_sketch_states(old: pd.DataFrame, new: pd.DataFrame, k: int) -> pd.DataFrame:
    """Union two (group, sketch) state tables (executor-side helper;
    also usable standalone for tests)."""
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
    distinct sketches under state_dir (versioned snapshots + CURRENT
    pointer). availableNow => drains the backlog then stops (resumable:
    the Spark checkpoint remembers progress)."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    os.makedirs(state_dir, exist_ok=True)

    def merge_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sigs = [kmv.deserialize(bytes(b))[0] for b in pdf["sketch"]]
        u = kmv.union_many(sigs, k)
        return pd.DataFrame({group_col: [key[0]], "sketch": [kmv.serialize(u, k)]})

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        version = f"state_v{batch_id}"
        prev = _current_state_path(state_dir)
        if prev is not None and os.path.basename(prev) == version:
            # retry of an already-committed batch (failure landed between
            # the CURRENT flip and the stream-checkpoint commit): state
            # already includes this batch — re-merging would read and
            # overwrite the same directory. The KMV union is idempotent,
            # so skipping preserves exactly-once semantics.
            return
        new = kmv_sketch_bytes_agg(
            batch_df.withColumn(group_col, F.col(group_col).cast("string")),
            group_col, value_col, k,
        )
        if prev is not None:
            new = new.unionByName(sess.read.parquet(prev))
        # distributed merge: per-group sketch union on executors
        merged = new.groupBy(group_col).applyInPandas(
            merge_group, f"{group_col} string, sketch binary"
        )
        out = os.path.join(state_dir, version)
        merged.write.mode("overwrite").parquet(out)
        old = _current_state_path(state_dir)
        _flip_current(state_dir, version)
        if old is not None and os.path.basename(old) != version:
            shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_state_estimates(state_dir: str, k: int = 256) -> pd.DataFrame:
    """Distinct-count estimates from the persisted sketch state."""
    import glob as _glob

    path = _current_state_path(state_dir)
    if path is None:  # legacy single-file layout
        path = os.path.join(state_dir, "kmv_state.parquet")
        files = [path]
    else:
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    state = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    rows = []
    for g, b in zip(state.iloc[:, 0], state["sketch"]):
        sig, kk = kmv.deserialize(bytes(b))
        lb, est, ub = kmv.estimate_bounds(sig, kk, 2)
        rows.append((g, est, lb, ub))
    return pd.DataFrame(rows, columns=["group", "distinct_est", "distinct_lb", "distinct_ub"])
