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
                    watermark: str | None = "1 day") -> DataFrame:
    """Tumbling window count/sum per event_type with late-event drop.
    ``watermark=None`` skips the watermark — for complete-mode runs where
    every window stays updatable and nothing may be dropped (the
    batch-equivalence contract of stream_tumbling_daily_live)."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events
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


def run_to_parquet_snapshot(stream_df: DataFrame, out_dir: str,
                            checkpoint_dir: str):
    """Drive a complete-mode aggregation stream into a parquet snapshot:
    each micro-batch's full result overwrites ``{out_dir}/current`` via
    stage + rename (readers never see a half-written snapshot; same
    discipline as the CDC state sink). Complete mode is the right shape
    for a windowed aggregate whose FINAL windows must appear — append
    mode only emits watermark-closed windows, so the last open window
    would be silently missing at end-of-stream. The snapshot is the
    aggregate itself (windows × groups rows), so per-batch I/O is
    O(result), not O(events). Returns the StreamingQuery."""
    import os
    import shutil

    def write_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        stage = os.path.join(out_dir, "stage")
        current = os.path.join(out_dir, "current")
        old = os.path.join(out_dir, "old")
        shutil.rmtree(stage, ignore_errors=True)
        batch_df.write.mode("overwrite").parquet(stage)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(current):
            os.rename(current, old)
        os.rename(stage, current)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(write_snapshot)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
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


def interval_join_attribution(clicks: DataFrame, purchases: DataFrame,
                              horizon: str = "2 hours",
                              watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's clicks in the preceding `horizon`. Both sides carry watermarks
    and the join condition bounds event-time distance, so Spark can expire
    buffered rows — state stays O(traffic within horizon), never the whole
    stream. The same function runs in batch (withWatermark is a no-op
    there), which is what the convergence test exploits."""
    c = clicks.select(
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_uid") == F.col("p_uid"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("c_uid").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
