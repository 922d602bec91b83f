"""Sampling & reshape operators.

The reference has no sampling surface (its harnesses take *all* N
requests, `unified_performance_test.sh:152-216`); a 100 TB pipeline needs
one. True `TABLESAMPLE`/`df.sample` randomness is engine- and
partitioning-dependent, so it can't be oracle-checked and isn't
reproducible across restarts — a real liability for training-data
pipelines. Both operators here are *deterministic* samples:

* systematic — `key % m == r`: partition-local (zero shuffle, no
  coordination), restart-stable, and at 100 TB the predicate is pushed to
  the scan so skipped rows still stream but never leave the mapper;
* stratified — fixed-size per stratum, ordered by an md5 of the row key:
  the hash de-correlates the sample from storage order (md5 is identical
  in every engine, unlike rand(seed)); one shuffle on the stratum key,
  same two-phase top-k shape as win_topn_per_group (salt it for giant
  strata, cf. win_topn_salted).

`reshape_unpivot` is the wide→long melt (Spark `DataFrame.unpivot`);
its inverse (long→wide pivot) is covered by b6_comparison_table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_for_compute, load_table


def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-97 systematic sample of lineitem keyed on orderkey."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 97 == 1).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


def sample_stratified(spark: SparkSession, sf_dir: str, per_stratum: int = 200) -> DataFrame:
    """Fixed-size (200/stratum) sample per returnflag, hash-ordered."""
    n_salt = 8
    # md5 over every row is the dominant cost — load_for_compute spreads
    # the scan beyond the parquet row-group count before the hash stage.
    l = load_for_compute(spark, sf_dir, "lineitem")
    hkey = F.md5(F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")))
    # (orderkey, linenumber) is NOT unique in the synthetic data — extend
    # the tie-break to the full unique key so ranks are engine-stable.
    order_cols = [
        F.col("_hkey").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_quantity").asc(),
        F.col("l_extendedprice").asc(),
    ]
    # Two-phase (salted) selection: with only a handful of strata, a single
    # window would serialize the whole table through #strata reducers. The
    # local phase keeps ≤ per_stratum rows per (stratum, salt) — the global
    # top-k is a subset of the union of local top-ks — so the final window
    # ranks ≤ 8·per_stratum rows per stratum.
    salted = l.withColumn("_hkey", hkey).withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    w_local = Window.partitionBy("l_returnflag", "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("lrn", F.row_number().over(w_local))
        .filter(F.col("lrn") <= per_stratum)
        .drop("_salt", "lrn")
    )
    w = Window.partitionBy("l_returnflag").orderBy(*order_cols)
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_stratum)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of part measures (Spark DataFrame.unpivot)."""
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return wide.unpivot(["p_partkey"], ["size", "retailprice"], "measure", "value")


QUERIES = {
    "sample_systematic": sample_systematic,
    "sample_stratified": sample_stratified,
    "reshape_unpivot": reshape_unpivot,
}

ORACLES = {
    "sample_systematic": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem WHERE l_orderkey % 97 = 1
    """,
    "sample_stratified": """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, rn
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-'
                                    || CAST(l_linenumber AS VARCHAR)),
                                l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice
                   ) AS rn
            FROM lineitem
        ) t
        WHERE rn <= 200
    """,
    "reshape_unpivot": """
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value
        FROM part
    """,
}
