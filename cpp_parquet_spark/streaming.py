"""Structured Streaming ingestion for the encode engine.

The reference is batch-only (single Flush, parquet-file.cc:118-177);
this module gives the engine a streaming front door the Spark-idiomatic
way: ``readStream`` → ``foreachBatch`` → the same checkpointed
EncodeJob used for batch, one lineage snapshot per micro-batch.  Spark's
own streaming checkpoint guarantees each micro-batch is delivered at
least once; EncodeJob's content-hash partition ids + orphan cleanup
make re-delivery idempotent, so the combination is effectively
exactly-once into the chunk store.

Also provides a windowed/watermarked stats stream over the ``events``
table shape (ts, user_id, event_type, amount) as the
late-data-handling example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cpp_parquet_spark.lineage import EncodeJob


def encode_stream(
    source: DataFrame,
    job: EncodeJob,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Attach the encode pipeline to a streaming DataFrame.

    Returns the StreamingQuery.  Each micro-batch runs through the
    same salted/checkpointed encode as batch mode, under snapshot id
    ``{job.snapshot_id}-b{batch_id}``.
    """

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_job = EncodeJob(
            base_dir=job.base_dir,
            num_parts=job.num_parts,
            keys=job.keys,
            codec=job.codec,
            chunk_rows=job.chunk_rows,
            snapshot_id=f"{job.snapshot_id}-b{batch_id}",
            salt_target_rows=job.salt_target_rows,
        )
        batch_job.run(batch_df)

    writer = source.writeStream.foreachBatch(run_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_parquet(
    source: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    row_group_rows: int = 1 << 16,
    trigger_available_now: bool = True,
):
    """Streaming sink writing REAL Parquet files with our writer: each
    micro-batch lands as ``batch-{id}/part-*.parquet`` via the
    distributed sink, so any Parquet reader can tail the directory.
    Spark's checkpoint + the per-batch subdirectory make re-delivery
    idempotent (a re-run batch overwrites its own directory only)."""
    import os

    from cpp_parquet_spark.sink import write_dataset

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_dir = os.path.join(out_dir, f"batch-{batch_id}")
        write_dataset(batch_df, batch_dir, row_group_rows=row_group_rows).collect()

    writer = source.writeStream.foreachBatch(run_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_stats(events: DataFrame, watermark: str = "10 minutes", window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation over the driver's events
    table shape (event_id, ts, user_id, event_type, value, props) —
    late rows beyond the watermark are dropped, state is bounded."""
    # watermarks require TIMESTAMP (LTZ); parquet often reads as NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )
