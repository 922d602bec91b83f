"""Table loading and view registration over the driver testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Special case: ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects; we read it via
``spark.sql.legacy.parquet.nanosAsLong`` and convert to a microsecond
TimestampType column (the data is µs-aligned, so conversion is lossless;
DuckDB oracles cast the same column with ``CAST(ts AS TIMESTAMP)``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with normalized types."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long → TimestampType(µs). Must be *integral* division:
        # ns epoch ≈ 1.7e18 exceeds double's 2^53, so `/ 1000` through a
        # double would be off by ±1 µs. The data is µs-aligned, so DIV is
        # lossless and matches DuckDB's CAST(ts_ns AS TIMESTAMP) exactly.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_for_compute(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table and spread it across the cluster for CPU-heavy per-row
    work (regex tokenization, UDF decode, vector math).

    Parquet compresses text/vectors so densely that one file split can
    hold the whole table — the scan then runs as a single task and the
    expensive expression pipeline above it serializes. One cheap
    round-robin shuffle of the raw rows buys full parallelism for the
    orders-of-magnitude-heavier compute stage. (At real scale the input
    has many files; this also protects against few-large-files layouts.)
    """
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (idempotent, per-session)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
