"""Structured Streaming operators over the events stream table.

The reference pipeline is pure batch (SURVEY.md §2.11) — resumability comes
from stage checkpoints. These operators exist for the engine's broader
training-data-pipeline surface: the same 5-minute epoch-bucket aggregation
the schedule join uses (floor(sec/300), GtfsConflationScheduleJoinDAO/
loaders.js:69), expressed as a streaming windowed aggregation with
watermarked late-data handling, over a file-stream source.

The streaming query and its batch equivalent share semantics: for a static
input, `epoch_counts_stream` (run to completion with availableNow) returns
exactly `epoch_counts_batch` (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def epoch_counts_batch(events: DataFrame) -> DataFrame:
    """Batch reference: 5-min tumbling window counts + value sums per type."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def epoch_counts_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "10 minutes",
):
    """File-source streaming variant with a watermark for late data.

    Returns the started StreamingQuery writing to an in-memory sink named
    'epoch_counts'; run with availableNow so a static directory is drained
    to completion (micro-batch catch-up), then query the sink table.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
        # watermarks require TIMESTAMP (parquet may carry TIMESTAMP_NTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("epoch_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "10 minutes",
):
    """Streaming exact deduplication: the first-seen document per content
    hash passes, later byte-identical arrivals are dropped.

    Uses dropDuplicatesWithinWatermark, so dedup state is BOUNDED — a
    content hash is evicted once its event time falls behind the watermark
    (the 100 TB/day ingestion shape: state size is O(docs per watermark
    window), not O(all docs ever)). Batch invariant asserted in tests: the
    drained stream emits exactly one row per distinct content hash, and the
    set of hashes equals the batch count-distinct.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("content_hash", F.md5(F.col("text")))
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
