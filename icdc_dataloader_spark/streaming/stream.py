"""Structured Streaming front-end for the CDC pipeline.

The deterministic micro-batch ledger (cdc.py) is the engine's canonical
tail loop; this wrapper hosts the SAME apply path under Spark Structured
Streaming for deployments where the binlog lands as files in a directory
(the reference's analogue: new S3 drops arriving via SQS events,
file_loader.py:428-456):

    readStream(file source) -> foreachBatch(apply) -> checkpointed query

Exactly-once composition: Structured Streaming's checkpoint gives
at-least-once foreachBatch delivery; the lake's committed-batch-id check
makes re-delivery a no-op (the same contract as the reference's
delete-message-only-after-success).  Batch identity = the streaming epoch
id, so a crashed epoch replays idempotently.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .cdc import CDCPipeline


def run_file_stream(
    spark: SparkSession,
    pipeline: CDCPipeline,
    source_dir: str,
    checkpoint_dir: str,
    schema=None,
    drain: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Tail ``source_dir`` for new parquet event files.

    ``drain=True`` processes everything currently available and stops
    (test/bench mode); otherwise returns the running StreamingQuery.
    """
    # foreachBatch delivers epochs in order (single checkpointed query),
    # which is exactly the ordered-delivery contract tombstone GC needs
    # when no pending-batch map exists (cdc._gc_watermark)
    pipeline.assume_ordered = True
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    reader = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("path", source_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.load()

    def apply(batch_df, epoch_id):
        df = batch_df.drop("batch_id") if "batch_id" in batch_df.columns else batch_df
        if df.isEmpty():
            return
        pipeline.apply_batch(df, f"epoch-{epoch_id}")

    q = (
        events.writeStream.foreachBatch(apply)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "query"))
        .trigger(availableNow=True)
        .start()
    )
    if drain:
        q.awaitTermination()
        return None
    return q
