"""SparkSession factory with scale-oriented defaults.

The reference delegates all tuning to HikariCP/Cloud Run knobs
(``application-cloud-sql.properties:16-20``, ``terraform/cloud_run.tf:17-41``);
our analog is a tuned SparkSession: AQE on (runtime re-planning replaces
Postgres's planner flexibility), Arrow for the few pandas-UDF paths, and
shuffle partitions sized by the caller (32 locally; thousands on a real
cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs we need even on sessions we did not create
# (the verify driver hands us its own session). All of these are dynamic.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    # read as long and convert explicitly (see catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet timestamps without isAdjustedToUTC (how the driver testdata
    # stores event times) must read as session-tz TIMESTAMP, not
    # TIMESTAMP_NTZ: NTZ breaks unix_micros()/watermarks, and with the
    # UTC session below the TIMESTAMP reading is value-identical to
    # DuckDB's naive-as-UTC epoch semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # deterministic timestamp semantics for oracle comparison
    "spark.sql.session.timeZone": "UTC",
    # AQE: coalesce post-shuffle partitions, handle skew joins at runtime
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDF / mapInPandas paths
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to an existing session (driver-owned or ours)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build: keep going, reads may still work
    return spark


def get_spark(
    app_name: str = "cdc-cloudrun-demo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a real cluster pass None with an external master configured.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # parquet: vectorized reader is default-on; keep file splits sane
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast threshold: dims (region/nation/part/supplier) stay small
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
