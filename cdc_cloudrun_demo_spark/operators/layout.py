"""Data-layout optimization: Z-order (Morton) clustering keys.

At 100 TB the cheapest scan is the one that never happens: parquet
row-group min/max statistics prune files, but only for columns the data
is clustered on. Sorting on one column gives perfect pruning for that
column and none for any other; interleaving the bits of TWO columns
(Z-order, the technique behind Delta's OPTIMIZE ZORDER BY and Iceberg's
sort orders) gives useful pruning on both at once. This module computes
the key; writers `orderBy(zkey)` before writing and every min/max-stat
consumer benefits with no further engine support.

The key is pure integer arithmetic (min/max normalization to 16 bits via
integer division, then bit interleaving) so the DuckDB oracle reproduces
it bit-for-bit — and the same expression runs unchanged on a cluster.
The locality claim itself (fewer files overlap a predicate range under
Z-order than under single-column sort) is proven against real parquet
footer statistics in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_BITS = 16


def _interleave_sql(a: str, b: str, shift_op: str) -> str:
    """The 2×16-bit Morton interleave as portable SQL. `a` contributes
    even bits, `b` odd bits. Identical text modulo the integer-shift
    dialect (Spark: shiftleft/shiftright functions; DuckDB: << >>)."""
    terms = []
    for i in range(_BITS):
        if shift_op == "fn":
            terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)  # disjoint bits: + == OR, and + folds better


def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (l_orderkey, l_partkey): each key min/max-normalizes
    to 16 bits with exact integer division (no float boundary anywhere),
    then the bits interleave. Plan: one tiny global min/max aggregate
    broadcast back onto a NARROW per-row expression — the corpus never
    shuffles to get its layout key; the optional `orderBy(zkey)` a writer
    adds is the one range exchange any clustering rewrite costs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bounds = li.agg(
        F.min("l_orderkey").alias("o_mn"),
        F.max("l_orderkey").alias("o_mx"),
        F.min("l_partkey").alias("p_mn"),
        F.max("l_partkey").alias("p_mx"),
    )
    with_bounds = li.crossJoin(F.broadcast(bounds))
    scale = (1 << _BITS) - 1
    # greatest(span, 1): a constant clustering column has span 0, and
    # both Spark `div` and DuckDB `//` return NULL on /0 — the guard
    # makes the normalized value 0 (a degenerate-but-defined key) instead
    # of NULLing every zkey; the oracle applies the same guard.
    a = (
        f"CAST((l_orderkey - o_mn) * {scale} AS BIGINT)"
        f" div greatest(CAST(o_mx - o_mn AS BIGINT), 1)"
    )
    b = (
        f"CAST((l_partkey - p_mn) * {scale} AS BIGINT)"
        f" div greatest(CAST(p_mx - p_mn AS BIGINT), 1)"
    )
    return with_bounds.select(
        "l_orderkey",
        "l_partkey",
        F.expr(
            _interleave_sql(f"({a})", f"({b})", "fn")
        ).cast("long").alias("zkey"),
    )


ZORDER_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(l_orderkey) AS o_mn, MAX(l_orderkey) AS o_mx,
               MIN(l_partkey) AS p_mn, MAX(l_partkey) AS p_mx
        FROM lineitem
    ), normed AS (
        SELECT l_orderkey, l_partkey,
               ((l_orderkey - o_mn) * {(1 << _BITS) - 1}) // greatest(o_mx - o_mn, 1) AS na,
               ((l_partkey - p_mn) * {(1 << _BITS) - 1}) // greatest(p_mx - p_mn, 1) AS nb
        FROM lineitem CROSS JOIN bounds
    )
    SELECT l_orderkey, l_partkey,
           CAST({_interleave_sql('na', 'nb', 'op')} AS BIGINT) AS zkey
    FROM normed
"""

QUERIES = {
    "layout_zorder_key": layout_zorder_key,
}

ORACLES = {
    "layout_zorder_key": ZORDER_ORACLE,
}
