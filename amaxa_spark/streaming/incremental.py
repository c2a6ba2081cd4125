"""Structured-Streaming extensions (beyond-reference).

The reference is batch-only (SURVEY §2.6) — these operators extend the
engine to incremental workloads on the ``events`` stream table:

- :func:`windowed_event_counts` — watermarked tumbling-window
  aggregation (late data beyond the watermark is dropped, state is
  bounded — the 100 TB-safe default);
- :func:`streaming_sessionize` — ``session_window`` gap-based
  sessionization, the streaming twin of the batch sessionize query;
- :func:`run_to_memory` — drives a streaming query over a static
  parquet directory to completion synchronously (local smoke-test
  harness; in production the same plan reads Kafka/files and writes an
  exactly-once sink via foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("hour_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def incremental_extract(
    events: DataFrame, since_epoch_ms: int | None
) -> DataFrame:
    """Batch incremental extract: records changed since the last
    watermark (the engine's changed-since extension of the reference's
    full-extract scopes). The predicate is a plain Catalyst filter, so
    it pushes down to the parquet scan / partition pruning; callers
    persist the new watermark as `max(ts)` of the returned slice."""
    if since_epoch_ms is None:
        return events
    return events.filter(
        F.unix_millis(F.col("ts")) > F.lit(int(since_epoch_ms))
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive the streaming query over all currently-available input
    and stop; results land in the in-memory table ``name``."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
