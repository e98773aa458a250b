"""Structured-Streaming near-duplicate ingest: readStream source →
foreachBatch delta-dedup sink over the manifest-versioned state
(plans/delta.py).

This is the streaming face of the incremental ingest lane: each
micro-batch pays O(delta) work (sign new rows once, semi-join-prune
stored bands to touched band keys, drop old×old candidates), and the
dedup state lives OUTSIDE Spark's state store — in the same
atomically-flipped parquet+manifest layout batch ingest uses — so a
batch job, a second stream, or an ad-hoc `state_clusters` reader can
all consume it.

Exactly-once ingest semantics come from two pieces composed:
  - Structured Streaming's checkpoint gives at-least-once foreachBatch
    delivery with a monotone `epoch_id` that REPEATS on replay after a
    failure;
  - `ingest_batch(epoch=...)` is idempotent per epoch: a committed
    epoch is recorded in the manifest (atomic flip), so a replay is a
    no-op, and a crash mid-ingest leaves an unreferenced orphan
    directory the replay supersedes.

Epoch tokens are NAMESPACED by the stream's persistent query id (the
`id` Structured Streaming writes into `checkpoint_dir/metadata`): raw
epoch_ids are only unique PER CHECKPOINT, so without the namespace a
fresh checkpoint (corruption recovery, reprocessing) or a second
stream feeding the same state_dir would restart at epoch 0 and have
its first batches silently discarded as historic replays. Same
checkpoint -> same id -> replays still dedupe; new checkpoint -> new
id -> no false replay. If the metadata file is unreadable the
checkpoint path itself is the namespace.

Clustering is deliberately NOT computed per micro-batch: connected
components is a multi-job stage whose output no sink consumes
mid-stream. Readers call `plans.delta.state_clusters` on demand (or
`ingest_batch` directly in batch jobs, which returns clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import FROZEN, DedupConfig
from ..plans.delta import ingest_batch

CORPUS_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _stream_tag(checkpoint_dir: str | None) -> str | None:
    """Persistent identity of the stream writing this checkpoint: the
    query `id` from `checkpoint_dir/metadata` (written at start(),
    before the first batch), falling back to the checkpoint path."""
    if checkpoint_dir is None:
        return None
    import json
    import os

    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return str(json.load(f)["id"])
    except Exception:
        return checkpoint_dir


def dedup_sink(
    state_dir: str, cfg: DedupConfig = FROZEN,
    checkpoint_dir: str | None = None,
):
    """foreachBatch function: ingest each micro-batch into the delta
    state, idempotent per (stream, epoch) — see module docstring.
    `checkpoint_dir=None` keeps raw-int epoch tokens (single-stream,
    never-recreated checkpoint; pre-namespace manifests)."""
    holder: dict[str, str] = {}

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if checkpoint_dir is not None and "tag" not in holder:
            holder["tag"] = _stream_tag(checkpoint_dir)
        tag = holder.get("tag")
        token = f"{tag}:{int(epoch_id)}" if tag else int(epoch_id)
        ingest_batch(
            batch_df.sparkSession, state_dir, batch_df, cfg,
            epoch=token, compute_clusters=False,
        )

    return _sink


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig = FROZEN,
    schema: str = CORPUS_SCHEMA,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source ingest stream: new parquet drops under `source_dir`
    flow through the delta-dedup sink into `state_dir`.

    `available_now=True` (the default) drains everything currently in
    the source then stops — the batch-backfill / catch-up mode; pass
    False for a continuously-running micro-batch stream.
    `max_files_per_trigger` bounds per-batch delta size (ingest cost is
    O(delta), so this is the knob that keeps micro-batches flat at
    web-scale drop rates)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(
            dedup_sink(state_dir, cfg, checkpoint_dir=checkpoint_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("dedup_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
