"""Streaming event-time analytics: watermarks + windowed aggregation.

Batch twins (and their DuckDB oracles) live in
operators/streaming_batch.py; these run the same folds as streams. The
watermark bounds state: with ``withWatermark("ts", delay)`` Spark drops
events later than the watermark and finalizes windows older than it —
the late-data policy the reference never had to define (its "stream" was
synchronous REST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window_len: str = "1 day",
                    watermark: str = "1 day") -> DataFrame:
    """Tumbling window count/sum per event_type with late-event drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / F.lit(100.0)).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n", "sum_value")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Session windows (gap-merged) per user — stateful in streaming."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def run_to_memory(stream_df: DataFrame, query_name: str, checkpoint_dir: str,
                  output_mode: str = "append"):
    """Drive a streaming DataFrame into an in-memory table (test sink)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
