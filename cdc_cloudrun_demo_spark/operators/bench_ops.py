"""B1–B9: the reference's bash benchmark-analytics pipeline as DataFrame ops.

The reference computes these with shell loops and `bc`
(``unified_performance_test.sh:152-593``, ``test_warm_performance.sh:55-228``,
``compare_services.sh:44-147``); here each is a declarative aggregation over
the ``service_samples`` fixture (fixtures.py A3). The bash pipeline is
O(samples) single-threaded; these are map-side-combined group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_for_compute
from ..fixtures import SERVICE_SAMPLES_SQL, service_samples_df
from ._util import davg, sql_davg

_CTE = f"WITH service_samples AS ({SERVICE_SAMPLES_SQL})"


# B1 — mean over samples (unified_performance_test.sh:201-208)
def b1_mean_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    return s.groupBy("service").agg(
        davg("duration_s", 6).alias("avg_duration_s"),
        F.count(F.lit(1)).alias("n_samples"),
    )


# B2 — mean excluding the cold-start sample (test_warm_performance.sh:72-88)
def b2_warm_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    return (
        s.filter(F.col("request_idx") > 1)
        .groupBy("service")
        .agg(davg("duration_s", 6).alias("warm_avg_s"), F.count(F.lit(1)).alias("n_warm"))
    )


# B3 — min/max with argmin/argmax returning the carrying service
# (unified_performance_test.sh:376-445). Per-service decimal means are
# engine-exact and distinct, so the extreme rows are deterministic; the
# service name is a defensive tie-break.
def b3_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    svc = s.groupBy("service").agg(
        davg("startup_s", 6).alias("avg_startup_s"),
        davg("memory_mb", 6).alias("avg_memory_mb"),
    )
    def pick(metric: str, order_col, label: str) -> DataFrame:
        return (
            svc.orderBy(order_col, F.asc("service"))
            .limit(1)
            .select(F.lit(label).alias("metric"), "service", F.col(metric).alias("value"))
        )
    return (
        pick("avg_startup_s", F.asc("avg_startup_s"), "fastest_startup")
        .unionAll(pick("avg_startup_s", F.desc("avg_startup_s"), "slowest_startup"))
        .unionAll(pick("avg_memory_mb", F.asc("avg_memory_mb"), "lowest_memory"))
        .unionAll(pick("avg_memory_mb", F.desc("avg_memory_mb"), "highest_memory"))
    )


# B4 — group-by image type + per-group means (unified_performance_test.sh:470-549)
def b4_group_by_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    return s.groupBy("image_type").agg(
        davg("startup_s", 6).alias("avg_startup_s"),
        davg("memory_mb", 6).alias("avg_memory_mb"),
        davg("duration_s", 6).alias("avg_duration_s"),
        F.count(F.lit(1)).alias("n_samples"),
    )


# B5 — cross-group ratio / % difference (compare_services.sh:144-147)
def b5_jvm_native_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    piv = s.groupBy().pivot("image_type", ["JVM", "Native (GraalVM)"]).agg(
        davg("startup_s", 6).alias("startup"), davg("memory_mb", 6).alias("memory")
    )
    jvm_st, nat_st = F.col("`JVM_startup`"), F.col("`Native (GraalVM)_startup`")
    jvm_mem, nat_mem = F.col("`JVM_memory`"), F.col("`Native (GraalVM)_memory`")
    return piv.select(
        jvm_st.alias("jvm_startup_s"),
        nat_st.alias("native_startup_s"),
        (jvm_st / nat_st).alias("startup_speedup"),
        ((F.lit(1.0) - nat_mem / jvm_mem) * 100.0).alias("memory_reduction_pct"),
    )


# B6 — service comparison pivot table (compare_services.sh:88-107)
def b6_comparison_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    return s.groupBy("service", "image_type", "pool_type").agg(
        davg("startup_s", 6).alias("avg_startup_s"),
        davg("memory_mb", 6).alias("avg_memory_mb"),
    )


# B7 — validity gating: drop failures, all-or-nothing batch mean
# (unified_performance_test.sh:177-199)
def b7_validity_gated_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    return s.groupBy("service").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("http_code") < 400, 1)).alias("n_valid"),
        (F.max("http_code") < 400).alias("all_ok"),
        F.when(F.max("http_code") < 400, davg("duration_s", 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("gated_mean_s"),
        davg(F.when(F.col("http_code") < 400, F.col("duration_s")), 6).alias(
            "valid_mean_s"
        ),
    )


# B8 — JSON field extraction (jq -r '.k // default'; compare_services.sh:71-75)
def b8_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_for_compute(spark, sf_dir, "events")
    k = F.coalesce(
        F.get_json_object(F.col("props"), "$.k").cast("int"), F.lit(-1)
    )
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            davg("k", 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") == -1, 1)).alias("n_missing"),
        )
    )


# B9 — event-time deltas between consecutive requests per service
# (date +%s.%N pairs; unified_performance_test.sh:163-189)
def b9_time_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = service_samples_df(spark, sf_dir)
    w = Window.partitionBy("service").orderBy("ts", "event_id")
    gaps = s.select(
        "service",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    return gaps.groupBy("service").agg(
        (F.sum("gap_us").cast("double") / F.count("gap_us")).alias("avg_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


def b10_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-family extension: per-service warm-up trend — the least-squares
    slope of duration vs request ordinal (the question the reference's
    warm-performance harness answers by eyeballing first-vs-rest means,
    ``test_warm_performance.sh:65-76``, answered properly).

    Exact-arithmetic discipline: the five regression sums (n, Σx, Σy,
    Σxy, Σx²) accumulate as BIGINTs over scaled ints — order-insensitive,
    map-side-combinable, one shuffle of 5 longs per service — and the
    closed form (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) is evaluated in doubles from
    those exact sums, identically in both engines. No double ever
    accumulates, so no last-ulp drift can break the hash."""
    from ._util import scaled_long

    s = service_samples_df(spark, sf_dir)
    x = F.col("request_idx").cast("long")
    y = scaled_long("duration_s", 2)
    sums = s.groupBy("service").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return sums.select(
        "service",
        F.col("n").alias("n_samples"),
        # slope is in scaled-y units per request; /100 back to seconds
        (slope / F.lit(100.0)).alias("slope_s_per_request"),
    )


QUERIES = {
    "b1_mean_duration": b1_mean_duration,
    "b2_warm_mean": b2_warm_mean,
    "b3_extremes": b3_extremes,
    "b4_group_by_image": b4_group_by_image,
    "b5_jvm_native_ratio": b5_jvm_native_ratio,
    "b6_comparison_table": b6_comparison_table,
    "b7_validity_gated_mean": b7_validity_gated_mean,
    "b8_json_extract": b8_json_extract,
    "b9_time_deltas": b9_time_deltas,
    "b10_regression_trend": b10_regression_trend,
}

ORACLES = {
    "b10_regression_trend": f"""
        {_CTE},
        sums AS (
            SELECT service,
                   COUNT(*) AS n,
                   SUM(CAST(request_idx AS BIGINT)) AS sx,
                   SUM(CAST(FLOOR(duration_s * 100 + 0.5) AS BIGINT)) AS sy,
                   SUM(CAST(request_idx AS BIGINT)
                       * CAST(FLOOR(duration_s * 100 + 0.5) AS BIGINT)) AS sxy,
                   SUM(CAST(request_idx AS BIGINT) * CAST(request_idx AS BIGINT))
                     AS sxx
            FROM service_samples GROUP BY service
        )
        SELECT service, n AS n_samples,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / 100.0 AS slope_s_per_request
        FROM sums
    """,
    "b1_mean_duration": f"""
        {_CTE}
        SELECT service, {sql_davg("duration_s", 6)} AS avg_duration_s,
               COUNT(*) AS n_samples
        FROM service_samples GROUP BY service
    """,
    "b2_warm_mean": f"""
        {_CTE}
        SELECT service, {sql_davg("duration_s", 6)} AS warm_avg_s,
               COUNT(*) AS n_warm
        FROM service_samples WHERE request_idx > 1 GROUP BY service
    """,
    "b3_extremes": f"""
        {_CTE},
        svc AS (
            SELECT service, {sql_davg("startup_s", 6)} AS avg_startup_s,
                   {sql_davg("memory_mb", 6)} AS avg_memory_mb
            FROM service_samples GROUP BY service
        )
        (SELECT 'fastest_startup' AS metric, service, avg_startup_s AS value
         FROM svc ORDER BY avg_startup_s ASC, service ASC LIMIT 1)
        UNION ALL
        (SELECT 'slowest_startup', service, avg_startup_s
         FROM svc ORDER BY avg_startup_s DESC, service ASC LIMIT 1)
        UNION ALL
        (SELECT 'lowest_memory', service, avg_memory_mb
         FROM svc ORDER BY avg_memory_mb ASC, service ASC LIMIT 1)
        UNION ALL
        (SELECT 'highest_memory', service, avg_memory_mb
         FROM svc ORDER BY avg_memory_mb DESC, service ASC LIMIT 1)
    """,
    "b4_group_by_image": f"""
        {_CTE}
        SELECT image_type,
               {sql_davg("startup_s", 6)} AS avg_startup_s,
               {sql_davg("memory_mb", 6)} AS avg_memory_mb,
               {sql_davg("duration_s", 6)} AS avg_duration_s,
               COUNT(*) AS n_samples
        FROM service_samples GROUP BY image_type
    """,
    "b5_jvm_native_ratio": f"""
        {_CTE},
        g AS (
            SELECT image_type,
                   {sql_davg("startup_s", 6)} AS st,
                   {sql_davg("memory_mb", 6)} AS mem
            FROM service_samples GROUP BY image_type
        )
        SELECT j.st AS jvm_startup_s,
               n.st AS native_startup_s,
               j.st / n.st AS startup_speedup,
               (1.0 - n.mem / j.mem) * 100.0 AS memory_reduction_pct
        FROM (SELECT * FROM g WHERE image_type = 'JVM') j
        CROSS JOIN (SELECT * FROM g WHERE image_type = 'Native (GraalVM)') n
    """,
    "b6_comparison_table": f"""
        {_CTE}
        SELECT service, image_type, pool_type,
               {sql_davg("startup_s", 6)} AS avg_startup_s,
               {sql_davg("memory_mb", 6)} AS avg_memory_mb
        FROM service_samples GROUP BY service, image_type, pool_type
    """,
    "b7_validity_gated_mean": f"""
        {_CTE}
        SELECT service,
               COUNT(*) AS n_total,
               COUNT(CASE WHEN http_code < 400 THEN 1 END) AS n_valid,
               MAX(http_code) < 400 AS all_ok,
               CASE WHEN MAX(http_code) < 400
                    THEN {sql_davg("duration_s", 6)} END AS gated_mean_s,
               {sql_davg("CASE WHEN http_code < 400 THEN duration_s END", 6)}
                 AS valid_mean_s
        FROM service_samples GROUP BY service
    """,
    "b8_json_extract": f"""
        SELECT event_type,
               {sql_davg("k", 6)} AS avg_k,
               MAX(k) AS max_k,
               COUNT(CASE WHEN k = -1 THEN 1 END) AS n_missing
        FROM (
            SELECT event_type,
                   COALESCE(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k
            FROM events
        ) e
        GROUP BY event_type
    """,
    "b9_time_deltas": f"""
        {_CTE},
        gaps AS (
            SELECT service,
                   epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY service ORDER BY ts, event_id) AS gap_us
            FROM service_samples
        )
        SELECT service,
               CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us,
               MAX(gap_us) AS max_gap_us
        FROM gaps GROUP BY service
    """,
}
