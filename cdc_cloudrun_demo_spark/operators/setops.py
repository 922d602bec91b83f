"""Set operations (SURVEY §2.2 — no reference implementation; planned).

Spark's `intersect`/`exceptAll` compile to aggregate/join plans; at scale
these shuffle on the full row, so project to the minimal key set first
(done below — nationkey only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cust_nations(spark, sf_dir).withColumn("side", F.lit("customer"))
    s = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supplier"))
    return c.unionByName(s)


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-mismatched sides align
    by column name, absent columns null-fill — the additive-schema-
    evolution shape (SURVEY §1.2) as a set operation."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_acctbal").alias("balance"),
    )
    return (
        c.withColumn("kind", F.lit("customer"))
        .unionByName(s.withColumn("kind", F.lit("supplier")), allowMissingColumns=True)
    )


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the sides):
    nation keys counted once per customer vs once per supplier."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (set semantics)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics EXCEPT ALL (multiplicity-aware)."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))


QUERIES = {
    "setop_union_all": setop_union_all,
    "setop_union_distinct": setop_union_distinct,
    "setop_union_by_name": setop_union_by_name,
    "setop_intersect": setop_intersect,
    "setop_intersect_all": setop_intersect_all,
    "setop_except": setop_except,
    "setop_except_all": setop_except_all,
}

ORACLES = {
    "setop_intersect_all": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "setop_union_by_name": """
        SELECT c_custkey AS entity_id, c_mktsegment AS segment,
               NULL AS balance, 'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey AS entity_id, NULL AS segment,
               s_acctbal AS balance, 'supplier' AS kind
        FROM supplier
    """,
    "setop_union_all": """
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    "setop_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    """,
    "setop_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    "setop_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
    """,
    "setop_except_all": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    """,
}
