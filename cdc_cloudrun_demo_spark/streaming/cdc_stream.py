"""Streaming CDC materializer (SURVEY §7 Phase 2 — the hard part).

Two interchangeable implementations of the same fold as operators/cdc.py:

1. ``materialize_foreach_batch`` — `foreachBatch` + idempotent parquet
   merge: each micro-batch folds its own events (LWW per key by seq),
   merges against the current state snapshot, and atomically replaces it.
   Exactly-once effect: the merge is idempotent (keyed LWW by global seq),
   so batch replay after failure converges. This is the pattern that maps
   to MERGE INTO on a transactional table (Delta/Iceberg) on a real
   cluster — swap `_merge_overwrite` for a MERGE and keep the fold.

2. ``materialize_with_state`` — `applyInPandasWithState` keyed state:
   per-key LWW state in the state store, update-mode output of changed
   keys. At scale this is the RocksDB-backed path
   (`spark.sql.streaming.stateStore.providerClass`), which keeps state on
   disk rather than heap.

Ordering: events are folded by `seq` (the replay-deterministic total
order, never wall clock), so any micro-batch slicing of the log produces
the same final state — asserted against the batch oracle in
tests/test_streaming.py.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

CHANGE_SCHEMA = "seq long, op string, id long, content string, ts timestamp"
STATE_SCHEMA = "id long, content string, last_seq long, updated_at timestamp"
# update-mode output of the keyed-state materializer (tombstones flagged)
UPDATES_SCHEMA = (
    "id long, content string, last_seq long, updated_at timestamp, is_deleted boolean"
)


def fold_batch(changes: DataFrame) -> DataFrame:
    """LWW-per-key fold of one slice of the log (same as operators/cdc.py)."""
    w = Window.partitionBy("id").orderBy(F.desc("seq"))
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "content", F.col("seq").alias("last_seq"),
                F.col("ts").alias("updated_at"), "op")
    )


def merge_states(current: DataFrame, delta_folded: DataFrame) -> DataFrame:
    """Merge a folded delta into the current state (keyed LWW by last_seq,
    tombstones drop). Idempotent: replaying a delta is a no-op."""
    cur = current.select("id", "content", "last_seq", "updated_at",
                         F.lit("UPDATE").alias("op"))
    unioned = cur.unionByName(delta_folded)
    w = Window.partitionBy("id").orderBy(F.desc("last_seq"))
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select("id", "content", "last_seq", "updated_at")
    )


def materialize_foreach_batch(
    changes_stream: DataFrame, state_dir: str, checkpoint_dir: str,
):
    """Start the foreachBatch materializer; returns the StreamingQuery.

    State lives at ``{state_dir}/current`` as parquet; each batch writes a
    new snapshot and swaps it in (atomic at the directory-rename level
    locally; on a real deployment this is MERGE INTO a Delta/Iceberg
    table, same fold)."""
    spark = changes_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        current_path = os.path.join(state_dir, "current")
        folded = fold_batch(batch_df)
        try:
            current = spark.read.parquet(current_path)
        except Exception:
            current = spark.createDataFrame([], STATE_SCHEMA)
        new_state = merge_states(current, folded)
        tmp = os.path.join(state_dir, f"next_{batch_id}")
        new_state.write.mode("overwrite").parquet(tmp)
        snapshot = spark.read.parquet(tmp)
        snapshot.write.mode("overwrite").parquet(current_path)

    return (
        changes_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def state_snapshot_sink(
    updates_stream: DataFrame, state_dir: str, checkpoint_dir: str,
):
    """foreachBatch sink for the keyed-state materializer: merge each
    micro-batch's updated keys into a parquet state snapshot (LWW per key
    by ``last_seq``; tombstone rows are *retained* in the snapshot so a
    replayed older update can never resurrect a deleted key — readers
    filter ``is_deleted``). Returns the StreamingQuery.

    This replaces the memory-sink + driver re-aggregation bridge: the
    update stream never passes through the driver; each merge is a
    distributed keyed aggregate. On a real deployment the merge is a
    MERGE INTO on a Delta/Iceberg table — identical fold, transactional
    swap instead of the local snapshot-rename."""
    spark = updates_stream.sparkSession
    current_path = os.path.join(state_dir, "current")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            cur = spark.read.parquet(current_path)
        except Exception:
            cur = spark.createDataFrame([], UPDATES_SCHEMA)
        merged = (
            cur.unionByName(batch_df)
            .groupBy("id")
            .agg(
                F.max_by("content", "last_seq").alias("content"),
                F.max("last_seq").alias("last_seq"),
                F.max_by("updated_at", "last_seq").alias("updated_at"),
                F.max_by("is_deleted", "last_seq").alias("is_deleted"),
            )
        )
        tmp = os.path.join(state_dir, f"next_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(current_path)

    return (
        updates_stream.writeStream.foreachBatch(process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _lww_state_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key LWW fold with explicit state (applyInPandasWithState)."""
    if state.exists:
        content, last_seq, ts_us, deleted = state.get
    else:
        content, last_seq, ts_us, deleted = None, -1, 0, False
    for pdf in pdf_iter:
        pdf = pdf.sort_values("seq")
        for row in pdf.itertuples(index=False):
            if row.seq <= last_seq:
                continue  # replayed event: idempotent skip
            last_seq = int(row.seq)
            ts_us = int(pd.Timestamp(row.ts).value // 1000)
            if row.op == "DELETE":
                deleted, content = True, None
            else:
                deleted, content = False, row.content
    state.update((content, last_seq, ts_us, deleted))
    yield pd.DataFrame(
        {
            "id": [key[0]],
            "content": [content],
            "last_seq": [last_seq],
            "updated_at": [pd.Timestamp(ts_us * 1000)],
            "is_deleted": [deleted],
        }
    )


def materialize_transform_with_state(changes_stream: DataFrame):
    """Same LWW fold on Spark 4's `transformWithStateInPandas` — the
    successor API to applyInPandasWithState: explicit typed state handles,
    per-key timers, and first-class RocksDB backing. The processor keeps
    one ValueState per key; replayed events (seq <= last seen) are
    idempotently skipped, DELETE leaves a tombstone flag the reader
    filters. Output mode: update (changed keys per micro-batch).

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and a working
    protobuf runtime (the TWS state-server protocol); environments
    without protobuf should use ``materialize_with_state`` — identical
    fold semantics on the older API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        "id long, content string, last_seq long, updated_at timestamp, is_deleted boolean"
    )

    class LwwProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "lww", "content string, last_seq long, ts_us long, deleted boolean"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                content, last_seq, ts_us, deleted = self._state.get()
            else:
                content, last_seq, ts_us, deleted = None, -1, 0, False
            for pdf in rows:
                pdf = pdf.sort_values("seq")
                for row in pdf.itertuples(index=False):
                    if row.seq <= last_seq:
                        continue  # replayed event: idempotent skip
                    last_seq = int(row.seq)
                    ts_us = int(pd.Timestamp(row.ts).value // 1000)
                    if row.op == "DELETE":
                        deleted, content = True, None
                    else:
                        deleted, content = False, row.content
            self._state.update((content, last_seq, ts_us, deleted))
            yield pd.DataFrame(
                {
                    "id": [key[0]],
                    "content": [content],
                    "last_seq": [last_seq],
                    "updated_at": [pd.Timestamp(ts_us * 1000)],
                    "is_deleted": [deleted],
                }
            )

        def close(self) -> None:
            pass

    return changes_stream.groupBy("id").transformWithStateInPandas(
        statefulProcessor=LwwProcessor(),
        outputStructType=out_schema,
        outputMode="update",
        timeMode="None",
    )


def materialize_with_state(changes_stream: DataFrame):
    """Keyed-state materializer: emits the updated row per key per batch
    (update mode). Filter ``is_deleted`` downstream for the live view."""
    out_schema = (
        "id long, content string, last_seq long, updated_at timestamp, is_deleted boolean"
    )
    state_schema = "content string, last_seq long, ts_us long, deleted boolean"
    return changes_stream.groupBy("id").applyInPandasWithState(
        _lww_state_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
