"""Continuous indexing: Structured Streaming → segment builds.

The reference's ingestion is an unbounded source micro-batched by a
commit timeout (60 s default, `quickwit-config/src/index_config/
mod.rs:126-128`) with a per-partition source checkpoint committed
atomically with split publish (`quickwit-metastore/src/
checkpoint.rs:368-440`). The Spark-native equivalent:

    readStream (file/kafka/rate source)
      → foreachBatch: build_index(batch_df, job_id=f"{name}-{batch_id}")
      → manifest commit inside the same call

Exactly-once: Structured Streaming replays a failed micro-batch with
the SAME batch_id; build_index is idempotent per (job_id, batch) — a
replay skips batches whose checkpoint is already in the manifest and
dynamic-partition-overwrite replaces any partially written files. So
the manifest stays consistent without two-phase commit, mirroring the
staged→published protocol.

No event-time semantics are needed (the reference has none — late data
just lands in a new split whose time_range overlaps, and time pruning
uses min/max ranges), so there are no watermarks here by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from quickwit_spark.index.builder import IndexConfig, build_index


def index_stream(
    stream_df: DataFrame,
    index_dir: str,
    config: IndexConfig,
    checkpoint_dir: str,
    name: str | None = None,
    trigger_seconds: int | None = None,
    transform=None,
):
    """Start a streaming indexing query; returns the StreamingQuery.

    `stream_df` is any streaming DataFrame with the configured schema
    (e.g. `spark.readStream.schema(s).parquet(dir)` or a Kafka source
    after JSON projection). `transform` is the VRL-analog ingest hook
    (`sources.transform.Transform`), applied per micro-batch before doc
    mapping — same position as the reference's VrlProcessing actor.

    `name` keys the manifest's replay checkpoints (job_id =
    `{name}-{batch_id}`) and defaults to a hash of `checkpoint_dir`:
    batch_ids restart at 0 whenever a stream gets a FRESH checkpoint
    location, so a fixed default name would make the manifest treat the
    new stream's batches as replays of the old one and silently drop
    them — and two streams writing one index would collide the same
    way. Pass an explicit `name` ONLY to resume the same logical
    stream across a checkpoint-location move."""
    if name is None:
        import hashlib

        name = "s" + hashlib.sha1(
            checkpoint_dir.encode("utf-8")
        ).hexdigest()[:10]

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_index(
            batch_df.sparkSession,
            batch_df,
            index_dir,
            config,
            job_id=f"{name}-{batch_id:06d}",
            transform=transform,
        )

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
