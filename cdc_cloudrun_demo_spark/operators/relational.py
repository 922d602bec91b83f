"""S1–S9: the reference's CRUD/metadata query surface (SURVEY §2.1).

The reference's REST endpoints compile to single-table SQL via Hibernate
(``MessageController.java:17-45``, ``DatabaseInfoResource.java:23-53``).
Here each becomes a declarative DataFrame op; Catalyst pushes the point
predicates to the parquet scan (S2), which at 100 TB means partition/
row-group pruning instead of a full read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, load_table
from ..fixtures import messages_df, messages_values_sql


# S1 — full table scan (GET /messages → findAll(); MessageController.java:17-20)
def s1_scan_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return messages_df(spark)


# S1 on a driver table: full scan with projection (column pruning reaches
# the parquet ReadSchema — verified in tests/test_plans.py)
def s1_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")


# S2 — point lookup by PK (GET /messages/{id} → findById; MessageController.java:27-30)
def s2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 42)


# S2 absent key → empty result (reference returns null/404)
def s2_point_lookup_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") == -1)


# S6 — count(*) per table (DatabaseInfoResource.java:40-41)
def s6_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("orders").alias("table_name"), "n"
    )
    c = load_table(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("customer").alias("table_name"), "n"
    )
    return o.unionAll(c)


# S7 — first-row sample (findAll().firstResult(); DatabaseInfoResource.java:71)
# findAll is unordered in the reference; we make the sample deterministic
# by keying it (SURVEY §7 risk #3).
def s7_first_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(1)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


# S8 — health probe (DatabaseHealthIndicator.java:20-30 → SELECT 1 analog)
def s8_health_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("SELECT 1 AS ok")


# S9 — metadata introspection (DatabaseInfoResource.java:27-36).
# Catalog metadata, not data — no SQL oracle (rows-only check).
def s9_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        rows.append((name, len(df.columns), ", ".join(df.columns)))
    return spark.createDataFrame(rows, "table_name string, n_columns int, columns string")


QUERIES = {
    "s1_scan_all": s1_scan_all,
    "s1_scan_projection": s1_scan_projection,
    "s2_point_lookup": s2_point_lookup,
    "s2_point_lookup_absent": s2_point_lookup_absent,
    "s6_count_star": s6_count_star,
    "s7_first_row": s7_first_row,
    "s8_health_probe": s8_health_probe,
    "s9_metadata": s9_metadata,
}

ORACLES = {
    "s1_scan_all": f"SELECT id, content FROM {messages_values_sql()}",
    "s1_scan_projection": "SELECT c_custkey, c_mktsegment FROM customer",
    "s2_point_lookup": "SELECT * FROM orders WHERE o_orderkey = 42",
    "s2_point_lookup_absent": "SELECT * FROM orders WHERE o_orderkey = -1",
    "s6_count_star": """
        SELECT 'orders' AS table_name, COUNT(*) AS n FROM orders
        UNION ALL
        SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
    """,
    "s7_first_row": """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders ORDER BY o_orderkey LIMIT 1
    """,
    "s8_health_probe": "SELECT 1 AS ok",
    # s9_metadata: rows-only (catalog introspection, not SQL-expressible)
}
