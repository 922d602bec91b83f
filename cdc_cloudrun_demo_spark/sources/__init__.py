"""Sources & sinks.

The reference's only source/sink is JDBC/PostgreSQL + JSON-over-HTTP
(SURVEY §2.1 "Scans/sources/sinks"); our native surface is columnar files
(parquet primary; csv/json interchange), an optional JDBC passthrough, and
streaming sources (file-replay for CDC logs, rate for synthetic load).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink — `partition_by` keys become directory
    pruning at read time (the 100 TB layout lever)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str, header: bool = True) -> DataFrame:
    # Explicit schema always: schema inference is a full extra pass at scale.
    return spark.read.csv(path, schema=schema, header=header)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.json(path, schema=schema)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str, partition_column: str | None = None,
    num_partitions: int = 8, lower_bound: int | None = None, upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC passthrough (the reference's native source). Partitioned reads
    only — an unpartitioned JDBC scan serializes on one task."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1 << 31)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def file_stream(
    spark: SparkSession, path: str, schema: StructType | str, fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-replay streaming source — the test-time stand-in for a Kafka
    change-log topic (one file ≈ one batch of WAL)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def write_ordered_slices(
    df: DataFrame,
    log_dir: str,
    slice_ids,
    key_col: str,
    n_slices: int,
) -> None:
    """Write one single-file parquet dir per slice (rows where
    ``key_col % n_slices == b``) under ``log_dir/slice_<b>`` and pin
    FileStreamSource delivery order by ascending mtime — THE replay
    harness for every live-twin entry (FileStreamSource orders by
    mtime; the in-order-contract discipline of operators/cdc.py).
    Shared so a fix to the ordering discipline lands once (round-10
    review found five copies). Callable incrementally: a later group's
    base starts at the previous group's max pinned mtime, so slice
    order stays globally ascending."""
    import os

    from pyspark.sql import functions as F

    dirs = []
    for b in slice_ids:
        d = os.path.join(log_dir, f"slice_{b:03d}")
        df.filter(F.col(key_col) % n_slices == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        dirs.append(d)
    pin_slice_order(log_dir, dirs)


def pin_slice_order(log_dir: str, dirs: list[str]) -> None:
    """Pin FileStreamSource delivery order for freshly written slice
    dirs: each gets an mtime strictly above EVERY slice_* file already
    under ``log_dir`` — not just this group's — so a later group's pins
    start above the previous group's (whose pins sit base+i in the
    future); without the global fold, two groups written into one log
    inside the pin window could interleave delivery order (round-10
    advice). Shared by `write_ordered_slices` and the entries whose
    slices carry custom contents (op columns, delete batches)."""
    import glob
    import os

    base = max(
        os.path.getmtime(f)
        for f in glob.glob(os.path.join(log_dir, "slice_*", "*"))
        if os.path.isfile(f)
    )
    for i, d in enumerate(dirs):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (base + i + 1, base + i + 1))


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def rate_change_stream(
    spark: SparkSession, rows_per_batch: int = 200, n_keys: int = 10
) -> DataFrame:
    """Continuous CDC change stream synthesized from Spark's deterministic
    `rate-micro-batch` source — the in-process stand-in for a Kafka/
    Debezium topic (SURVEY §1.4: the mutation stream is WAL-shaped; the
    fold must not care where it comes from). Each generated `value`
    becomes one change event in CHANGE_SCHEMA shape:

      seq = value                  (the replay-deterministic total order)
      id  = value % n_keys
      op  = DELETE when value % 7 == 3 else UPSERT
      content = 'v-<value>'        (NULL on deletes)

    Because the mapping is a pure function of `value` and the source
    emits 0,1,2,... exactly once per offset range, the state any prefix
    folds to is computable in closed form — what the source-agnosticism
    test asserts. A real Kafka topic slots in by replacing this reader
    with `format("kafka")` + the same projection over the decoded value;
    nothing downstream changes."""
    from pyspark.sql import functions as F

    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    return rate.select(
        F.col("value").alias("seq"),
        F.when(F.col("value") % 7 == 3, F.lit("DELETE"))
        .otherwise(F.lit("UPSERT"))
        .alias("op"),
        (F.col("value") % n_keys).alias("id"),
        F.when(F.col("value") % 7 == 3, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v-"), F.col("value")))
        .alias("content"),
        F.col("timestamp").alias("ts"),
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Small-file compaction — the maintenance job every long-running
    ingest needs at scale: streaming micro-batches and over-parallel
    writes leave datasets as thousands of KB-sized files, and at 100 TB
    the resulting footer/open overhead dominates scan time (and murders
    the driver's file-listing phase). Rewrites the dataset into
    ~``target_file_bytes`` files when (and only when) that reduces the
    file count; returns the resulting file count.

    Mechanics: measured (not estimated) bytes decide the target count;
    ``coalesce`` — not ``repartition`` — does the rewrite, so compaction
    moves no rows between executors and costs one read+write, no
    shuffle. The rewrite stages to a sibling dir and swaps in via the
    same rename discipline as the streaming snapshot sink, so a reader
    never sees a half-written dataset. Already-compact data is a no-op
    (idempotent maintenance loop)."""
    import glob
    import math
    import shutil

    files = glob.glob(os.path.join(path, "*.parquet")) + glob.glob(
        os.path.join(path, "part-*")
    )
    files = sorted(set(f for f in files if os.path.isfile(f)))
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if n_target >= len(files):
        return len(files)
    stage = path.rstrip("/") + "_compact_stage"
    old = path.rstrip("/") + "_compact_old"
    shutil.rmtree(stage, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_target).write.mode("overwrite").parquet(stage)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(stage, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(
        [f for f in glob.glob(os.path.join(path, "*")) if f.endswith(".parquet")]
    )
