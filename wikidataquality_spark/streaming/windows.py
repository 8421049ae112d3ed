"""Streaming window operators over the events stream.

Each builder takes a (possibly streaming) events DataFrame with
(event_id, ts, user_id, event_type, value) and returns the transformed
DataFrame; run_stream_to_memory drives a streaming source to completion
synchronously for tests (memory sink + processAllAvailable).

Watermarks bound state: at production rates (10^9 events/hour) the
10-minute watermark caps the window-state store; late rows beyond it drop
(counted by the sink's metrics, not silently).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour windows per event_type (streaming twin of the batch
    events_hourly plan)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


def sliding_value_avg(
    events: DataFrame, size: str = "30 minutes", slide: str = "10 minutes"
) -> DataFrame:
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", "10 minutes")
    return src.groupBy(F.window("ts", size, slide).alias("win"), "event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once-per-event_id within the watermark horizon."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
        return src.dropDuplicatesWithinWatermark(["event_id"])
    return src.dropDuplicates(["event_id"])


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user (streaming twin of sessionize_users)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", "10 minutes")
    return src.groupBy(F.session_window("ts", gap).alias("sess"), "user_id").agg(
        F.count("*").alias("n_events")
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str = "append",
) -> DataFrame:
    """Drive a streaming query over a bounded source to completion; return the
    materialized result (test harness — the guide's memory-sink idiom)."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def incremental_validate(
    spark: SparkSession,
    pages_stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch incremental validation: each micro-batch runs the full
    batch pipeline (the EvaluateConstraintReportJob analogue — re-check only
    what changed). Exactly-once: the sink is partitioned by epoch_id with
    dynamic partition overwrite, so a batch that is retried after a partial
    write REPLACES its own partition instead of appending duplicates — the
    checkpoint alone only gives at-least-once for blind parquet appends."""
    from pyspark.sql import functions as SF

    from wikidataquality_spark.pipeline import results, validate

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        out = results(validate(batch_df)).withColumn("_epoch", SF.lit(epoch_id))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(sink_dir)
        )

    return (
        pages_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
