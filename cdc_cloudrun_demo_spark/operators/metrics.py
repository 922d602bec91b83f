"""M1–M3: the /metrics derived-scalar analytics (MetricsController.java:34-118).

The reference computes uptime/memory%/startup scalars from process-local
counters and assembles nested JSON (README.md:234-258). Our analog derives
the same *shapes* — computed-column projection, nested-record construction,
conditional classification — from the service_samples fixture so they are
oracle-checkable. JSON strings are assembled with explicit printf-style
formatting so both engines produce byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import SERVICE_SAMPLES_SQL, service_samples_df
from ._util import davg, sql_davg

_CTE = f"WITH service_samples AS ({SERVICE_SAMPLES_SQL})"

_MAX_MEMORY_MB = 512.0  # the reference's JVM container limit (cloud_run.tf:36-41)


# M1 — derived scalar metrics (startup/uptime/memory%; MetricsController.java:53-73)
def m1_derived_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    per_svc = s.groupBy("service").agg(
        davg("startup_s", 6).alias("startup_seconds"),
        davg("memory_mb", 6).alias("used_mb"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("uptime_us"),
    )
    return per_svc.select(
        "service",
        "startup_seconds",
        (F.col("startup_seconds") * 1000.0).alias("startup_ms"),
        "used_mb",
        (F.col("used_mb") * 100.0 / F.lit(_MAX_MEMORY_MB)).alias("usage_percent"),
        (F.col("uptime_us") / F.lit(1000000.0)).alias("uptime_seconds"),
        F.format_string("%.2f MB", F.col("used_mb")).alias("used_formatted"),
        F.format_string("%.1f%%", F.col("used_mb") * 100.0 / F.lit(_MAX_MEMORY_MB)).alias(
            "usage_formatted"
        ),
    )


# M2 — nested-record construction → JSON (MetricsController.java:68-81)
def m2_nested_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    per_svc = s.groupBy("service").agg(
        davg("startup_s", 6).alias("startup_seconds"),
        davg("memory_mb", 6).alias("used_mb"),
    )
    payload = F.concat(
        F.lit('{"service":"'),
        F.col("service"),
        F.lit('","startupTimeSeconds":'),
        F.format_string("%.3f", F.col("startup_seconds")),
        F.lit(',"memory":{"usedMB":'),
        F.format_string("%.2f", F.col("used_mb")),
        F.lit(',"maxMB":'),
        F.format_string("%.2f", F.lit(_MAX_MEMORY_MB)),
        F.lit("}}"),
    )
    return per_svc.select("service", payload.alias("metrics_json"))


# M3 — conditional classification (imageType/poolType; MetricsController.java:44-50)
def m3_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    return (
        s.select("service", "image_type", "pool_type")
        .distinct()
        .select(
            "service",
            "image_type",
            "pool_type",
            (F.col("image_type") != "JVM").alias("is_native"),
            F.when(F.col("pool_type") == "PgBouncer", F.lit("pooled-proxy"))
            .otherwise(F.lit("direct-socket"))
            .alias("connection_class"),
        )
    )


QUERIES = {
    "m1_derived_metrics": m1_derived_metrics,
    "m2_nested_json": m2_nested_json,
    "m3_classification": m3_classification,
}

ORACLES = {
    "m1_derived_metrics": f"""
        {_CTE},
        per_svc AS (
            SELECT service,
                   {sql_davg("startup_s", 6)} AS startup_seconds,
                   {sql_davg("memory_mb", 6)} AS used_mb,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS uptime_us
            FROM service_samples GROUP BY service
        )
        SELECT service,
               startup_seconds,
               startup_seconds * 1000.0 AS startup_ms,
               used_mb,
               used_mb * 100.0 / {_MAX_MEMORY_MB} AS usage_percent,
               uptime_us / 1000000.0 AS uptime_seconds,
               printf('%.2f MB', used_mb) AS used_formatted,
               printf('%.1f%%', used_mb * 100.0 / {_MAX_MEMORY_MB}) AS usage_formatted
        FROM per_svc
    """,
    "m2_nested_json": f"""
        {_CTE},
        per_svc AS (
            SELECT service,
                   {sql_davg("startup_s", 6)} AS startup_seconds,
                   {sql_davg("memory_mb", 6)} AS used_mb
            FROM service_samples GROUP BY service
        )
        SELECT service,
               '{{"service":"' || service || '","startupTimeSeconds":'
                 || printf('%.3f', startup_seconds)
                 || ',"memory":{{"usedMB":' || printf('%.2f', used_mb)
                 || ',"maxMB":' || printf('%.2f', {_MAX_MEMORY_MB})
                 || '}}}}' AS metrics_json
        FROM per_svc
    """,
    "m3_classification": f"""
        {_CTE}
        SELECT DISTINCT service, image_type, pool_type,
               image_type <> 'JVM' AS is_native,
               CASE WHEN pool_type = 'PgBouncer' THEN 'pooled-proxy'
                    ELSE 'direct-socket' END AS connection_class
        FROM service_samples
    """,
}
