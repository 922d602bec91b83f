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
    # Belt-and-braces for sessions where inferTimestampNTZ=false didn't
    # land before the first read: NTZ → session-tz TIMESTAMP. The session
    # pins UTC, so the cast is wall-clock-preserving and matches the
    # DuckDB oracles' naive-as-UTC semantics (no-op on conforming reads).
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_for_compute(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table and ensure the cluster-wide parallelism needed for
    CPU-heavy per-partition work above the scan: regex tokenization, UDF
    decode, vector math, and *partial aggregation* (which runs before the
    first exchange, inside the scan stage).

    Adaptive: parquet can only parallelize down to the row group, so a
    few-large-row-groups layout (like the testdata's one-row-group files)
    pins the whole pipeline to a handful of tasks. When the scan's natural
    split count is far below the core count, one cheap round-robin shuffle
    of the raw rows buys full parallelism for the orders-of-magnitude-
    heavier compute stage. When the layout already parallelizes (the
    normal case at scale: thousands of files), this is a no-op — no extra
    shuffle is ever added to a well-laid-out input.
    """
    df = load_table(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    try:
        scan_parts = df.rdd.getNumPartitions()
    except Exception:
        scan_parts = cores
    if scan_parts * 2 < cores:
        df = df.repartition(cores)
    return df


def load_for_heavy_compute(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load_for_compute` with a LINEAGE BREAK after the spreading
    shuffle, for operators whose downstream work is a heavy
    deterministic FILTER/projection (regex tokenization + n-gram set
    math over every row): Catalyst pushes deterministic predicates
    through a Repartition node, so load_for_compute's shuffle alone
    cannot stop the expensive expressions from collapsing back into the
    row-group-bound scan stage — measured 25 s on ONE task vs ~1.5 s
    spread, sf0.1 documents. The eager-less localCheckpoint turns the
    repartitioned rows into an RDD scan no predicate can push below, so
    the compute genuinely runs at core parallelism.

    Applied ONLY in the pathological few-row-groups case — when the
    layout already parallelizes (thousands of files at real scale) this
    is load_table verbatim: no shuffle, no checkpoint, full pushdown."""
    df = load_table(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    try:
        scan_parts = df.rdd.getNumPartitions()
    except Exception:
        scan_parts = cores
    if scan_parts * 2 < cores:
        df = df.repartition(cores).localCheckpoint(eager=False)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (idempotent, per-session)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
