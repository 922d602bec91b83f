"""Deterministic fixture derivations shared by Spark queries and DuckDB oracles.

The reference's CDC/benchmark data does not ship as files — the mutation
stream exists only as REST traffic (``MessageController.java:22-45``) and
the benchmark samples only as bash-loop locals
(``unified_performance_test.sh:152-216``). To make those operator families
oracle-checkable we derive them *deterministically* from the driver's
``events`` table, with the same logic expressed twice: once as DataFrame
API (Spark side) and once as a SQL CTE (DuckDB oracle side). Any drift
between the two is caught by the oracle harness in tests/.

Fixture families (FIXTURES.md):
  A1 ``messages``        — the 5 seed rows from the reference's import.sql
  A2 ``message_changes`` — CDC change-event log  (events → op/id/content/ts/seq)
  A3 ``service_samples`` — benchmark harness samples (events → service/duration/...)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

from .catalog import load_table

# --------------------------------------------------------------------------
# A1. messages — seed rows from the reference's import.sql:13-17
# --------------------------------------------------------------------------

MESSAGES_ROWS: list[tuple[int, str]] = [
    (1, "Hello from Quarkus Cloud Run!"),
    (2, "Testing JVM vs Native performance"),
    (3, "Direct connection to Cloud SQL"),
    (4, "Using PgBouncer for connection pooling"),
    (5, "Jib makes container builds easy!"),
]

MESSAGES_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("content", StringType(), True),
    ]
)


def messages_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(MESSAGES_ROWS, MESSAGES_SCHEMA)


def messages_values_sql() -> str:
    """DuckDB VALUES expression equivalent to messages_df."""
    rows = ", ".join(
        "(CAST({} AS BIGINT), '{}')".format(i, c.replace("'", "''"))
        for i, c in MESSAGES_ROWS
    )
    return f"(SELECT * FROM (VALUES {rows}) AS _m(id, content))"


# --------------------------------------------------------------------------
# A2. message_changes — CDC change log derived from events
# --------------------------------------------------------------------------
# Mapping: every event is a mutation on the keyed `message` state
#   signup → INSERT, error → DELETE (tombstone), others → UPDATE
#   key = user_id, payload = props, total order = event_id (the `seq`).
# Mirrors the reference's REST-mutation semantics (SURVEY §1.4).

MESSAGE_CHANGES_SQL = """
SELECT
  event_id AS seq,
  CASE WHEN event_type = 'signup' THEN 'INSERT'
       WHEN event_type = 'error' THEN 'DELETE'
       ELSE 'UPDATE' END AS op,
  user_id AS id,
  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content,
  CAST(ts AS TIMESTAMP) AS ts
FROM events
"""


def message_changes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
        .alias("op"),
        F.col("user_id").alias("id"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("props"))
        .alias("content"),
        F.col("ts"),
    )


# --------------------------------------------------------------------------
# A3. service_samples — benchmark-harness samples derived from events
# --------------------------------------------------------------------------
# Shapes the bash harness data (`unified_performance_test.sh:114-266`):
# 5 synthetic services (one per event_type), request ordinal per service,
# duration/startup/memory derived arithmetically, ~1% failures.

_SERVICE_CASE = """
  CASE event_type
    WHEN 'click'    THEN 'jvm_hikari'
    WHEN 'view'     THEN 'jvm_cloud_sql'
    WHEN 'error'    THEN 'jvm_hikari_pgbouncer'
    WHEN 'purchase' THEN 'native_hikari'
    ELSE                 'native_cloud_sql'
  END
"""

SERVICE_SAMPLES_SQL = f"""
SELECT
  service,
  CASE WHEN service LIKE 'jvm%' THEN 'JVM' ELSE 'Native (GraalVM)' END AS image_type,
  CASE WHEN service LIKE '%pgbouncer' THEN 'PgBouncer' ELSE 'Direct' END AS pool_type,
  CAST(ROW_NUMBER() OVER (PARTITION BY service ORDER BY ts, event_id) AS INT)
    AS request_idx,
  value / 100.0 AS duration_s,
  CASE WHEN event_id % 97 = 0 THEN 500 ELSE 200 END AS http_code,
  CASE WHEN service LIKE 'jvm%' THEN 5.0 + value / 1000.0
       ELSE 0.08 + value / 10000.0 END AS startup_s,
  CASE WHEN service LIKE 'jvm%' THEN 400.0 + value / 10.0
       ELSE 140.0 + value / 20.0 END AS memory_mb,
  event_id,
  CAST(ts AS TIMESTAMP) AS ts
FROM (
  SELECT {_SERVICE_CASE} AS service, event_id, value, ts
  FROM events
) _s
"""


def service_samples_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    service = (
        F.when(F.col("event_type") == "click", F.lit("jvm_hikari"))
        .when(F.col("event_type") == "view", F.lit("jvm_cloud_sql"))
        .when(F.col("event_type") == "error", F.lit("jvm_hikari_pgbouncer"))
        .when(F.col("event_type") == "purchase", F.lit("native_hikari"))
        .otherwise(F.lit("native_cloud_sql"))
    )
    base = ev.select(
        service.alias("service"),
        F.col("event_id"),
        F.col("value"),
        F.col("ts"),
    )
    is_jvm = F.col("service").startswith("jvm")
    w = Window.partitionBy("service").orderBy("ts", "event_id")
    return base.select(
        "service",
        F.when(is_jvm, F.lit("JVM")).otherwise(F.lit("Native (GraalVM)")).alias("image_type"),
        F.when(F.col("service").endswith("pgbouncer"), F.lit("PgBouncer"))
        .otherwise(F.lit("Direct"))
        .alias("pool_type"),
        F.row_number().over(w).cast("int").alias("request_idx"),
        (F.col("value") / 100.0).alias("duration_s"),
        F.when(F.col("event_id") % 97 == 0, F.lit(500)).otherwise(F.lit(200)).alias("http_code"),
        F.when(is_jvm, 5.0 + F.col("value") / 1000.0)
        .otherwise(0.08 + F.col("value") / 10000.0)
        .alias("startup_s"),
        F.when(is_jvm, 400.0 + F.col("value") / 10.0)
        .otherwise(140.0 + F.col("value") / 20.0)
        .alias("memory_mb"),
        "event_id",
        "ts",
    )
