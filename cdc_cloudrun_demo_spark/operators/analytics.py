"""Composite analytics — TPC-H-shaped multi-operator queries.

The reference's users run whole queries, not single operators
(`unified_performance_test.sh` drives full endpoint→SQL paths); this
module covers the classic composite shapes the single-operator inventory
doesn't: EXISTS-decorrelation, HAVING, outer-join distributions, nested
aggregates. Each is the canonical TPC-H pattern re-cut to the driver's
synthetic star schema.

Scale notes: every query here is one or two hash shuffles on its natural
key; EXISTS compiles to a left-semi hash join (no row duplication), the
Q13 distribution's second aggregate runs on already-tiny data, and the
nested-aggregate threshold is an exact scaled-integer comparison against
a broadcast 1-row aggregate (no float flip, no fact-side reshuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import dsum, scaled_long, sql_dsum

_SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def qx_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one heavy lineitem (qty > 45),
    counted per priority. EXISTS → left-semi join on the order key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def qx_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, zeros
    included — left outer join, then two stacked aggregations."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def qx_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING shape: parts whose lineitem count reaches 30 — the filter
    runs on the aggregate output (post-shuffle, already tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .filter(F.col("n_items") >= 30)
    )


def qx_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11/Q15 shape: suppliers whose revenue exceeds the mean
    per-supplier revenue. Inner aggregate per supplier; the global mean is
    a 1-row broadcast; `rev_s · n > Σ rev_s` compares exact scaled longs."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(scaled_long(_disc_price(), 2)).alias("rev_s")
    )
    tot = per_supp.agg(
        F.sum("rev_s").alias("s_total"), F.count(F.lit(1)).alias("n_supp")
    )
    return (
        per_supp.join(F.broadcast(tot))
        .filter(F.col("rev_s") * F.col("n_supp") > F.col("s_total"))
        .select(
            "l_suppkey",
            (F.col("rev_s").cast("double") / F.lit(100.0)).alias("revenue"),
        )
    )


def qx_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar subquery): customers holding the
    maximum account balance of their nation. Decorrelated the way Catalyst
    itself would: the per-nation max is a tiny aggregate (one row per
    nation) joined back by broadcast — the customer table streams through
    once, no per-row subquery execution. Balance equality is exact (both
    engines read identical parquet doubles)."""
    c = load_table(spark, sf_dir, "customer")
    per_nation = (
        c.groupBy("c_nationkey")
        .agg(F.max("c_acctbal").alias("max_bal"))
        .select(F.col("c_nationkey").alias("nk"), "max_bal")
    )
    return c.join(
        F.broadcast(per_nation),
        (F.col("c_nationkey") == F.col("nk")) & (F.col("c_acctbal") == F.col("max_bal")),
    ).select(
        "c_custkey", "c_name", F.col("c_nationkey").alias("nationkey"), "c_acctbal"
    )


def qx_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose total lineitem
    quantity exceeds 100, joined back to the customer. The qualifying key
    set is an aggregate-then-filter (tiny), which then SEMI-joins the
    detail — the detail table is aggregated once and never re-scanned per
    qualifying order. Quantity threshold compares exact scaled longs."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(scaled_long("l_quantity")).alias("qty_s")
    )
    big = per_order.filter(F.col("qty_s") > 100 * 100)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            (F.col("qty_s").cast("double") / F.lit(100.0)).alias("total_qty"),
        )
    )


def qx_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from lineitems where the customer and the
    supplier share a nation, per nation. The same-nation predicate is a
    cross-dimension equality evaluated after the dim joins — all dims
    broadcast, the fact side shuffles only for the lineitem⨝orders key
    and the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(_disc_price(), 6).alias("revenue"))
    )


QUERIES = {
    "qx_priority_exists": qx_priority_exists,
    "qx_correlated_max": qx_correlated_max,
    "qx_large_orders": qx_large_orders,
    "qx_local_supplier_volume": qx_local_supplier_volume,
    "qx_custdist": qx_custdist,
    "qx_having": qx_having,
    "qx_nested_agg": qx_nested_agg,
}

ORACLES = {
    "qx_local_supplier_volume": f"""
        SELECT n_name, {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name
    """,
    "qx_large_orders": """
        WITH per_order AS (
            SELECT l_orderkey,
                   SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_s
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(qty_s AS DOUBLE) / 100.0 AS total_qty
        FROM orders
        JOIN per_order ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE qty_s > 10000
    """,
    "qx_correlated_max": """
        SELECT c_custkey, c_name, c_nationkey AS nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    "qx_priority_exists": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
    """,
    "qx_custdist": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) t
        GROUP BY c_count
    """,
    "qx_having": f"""
        SELECT l_partkey, COUNT(*) AS n_items, {sql_dsum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 30
    """,
    "qx_nested_agg": f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   SUM(CAST(FLOOR(({_SQL_DISC_PRICE}) * 100 + 0.5) AS BIGINT))
                     AS rev_s
            FROM lineitem GROUP BY l_suppkey
        ),
        t AS (SELECT SUM(rev_s) AS s_total, COUNT(*) AS n_supp FROM per_supp)
        SELECT l_suppkey, CAST(rev_s AS DOUBLE) / 100.0 AS revenue
        FROM per_supp, t
        WHERE rev_s * n_supp > s_total
    """,
}
