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


def sample_mixture(spark: SparkSession, sf_dir: str, total: int = 200) -> DataFrame:
    """Temperature-based mixture sampling over document sources (the
    dataset-mixing step of a pre-training corpus): each source's quota is
    proportional to count^0.5 (temperature T=2 up-weights small sources,
    the standard multilingual/multi-source rebalancing move), and the
    quota is filled deterministically by md5-hash order within the
    source.

    Every step is engine-exact: the sqrt weight is scaled to a long
    (floor(sqrt(c)·1000 + 0.5) — IEEE sqrt is correctly rounded, so both
    engines see the same double before the same rounding), the weight
    total is an exact integer sum, and the quota is one integer
    multiply-divide — no float accumulation anywhere, so the selection
    boundary can never flip between engines. Plan shape: the per-source
    counts are a tiny aggregate broadcast back onto the corpus; the
    quota fill is the same hash-ordered window as sample_stratified
    (salt it for giant sources)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    w = counts.withColumn(
        "w", F.floor(F.sqrt(F.col("c")) * 1000 + F.lit(0.5)).cast("long")
    )
    tot = w.agg(F.sum("w").alias("w_total"))
    quota = (
        w.join(F.broadcast(tot))
        .withColumn("n_quota", F.expr(f"({total} * w) div w_total"))
        .select("source", "n_quota")
    )
    win = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(win))
        .join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("n_quota"))
        .select("source", "doc_id", F.col("rn").cast("long").alias("rn"), "n_quota")
    )


def sample_weighted(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """WEIGHTED systematic sampling — quality/length-weighted corpus
    selection (longer documents proportionally likelier, the standard
    token-budgeted corpus draw), fully deterministic and engine-exact:
    no `pow`/`log` ranking (Efraimidis-Spirakis keys need transcendentals
    whose last ulp differs across libms), just integer cumulative weight
    crossing integer step boundaries.

    Order is the md5 hash of the key (engine-identical, de-correlated
    from storage order). The cumulative weight is a DISTRIBUTED two-phase
    prefix sum — the scale-correct shape, not a single global window:
    the first hex byte of the ordering hash partitions the corpus into
    256 buckets whose (bucket, hash) order equals the global hash order
    (the bucket IS the hash prefix); phase 1 cumsums within each bucket
    in parallel, phase 2 computes running bucket offsets over exactly
    256 rows (bounded window, the merged-KMV discipline). A row is
    selected iff its weight interval [cum-w, cum) crosses a multiple of
    step = w_total div k — floor-division crossings, exact in both
    engines. At 100 TB nothing changes: the corpus never hits a single
    reducer, and the per-bucket windows salt like any hot window."""
    d = load_for_compute(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    rows = d.select(
        "doc_id", "w", h.alias("h"), F.substring(h, 1, 2).alias("bkt")
    )
    w_local = Window.partitionBy("bkt").orderBy("h")
    local = rows.withColumn("lcum", F.sum("w").over(w_local))
    bkt_tot = rows.groupBy("bkt").agg(F.sum("w").alias("btot"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bkt_tot.withColumn(
        "boff", F.coalesce(F.sum("btot").over(w_off), F.lit(0))
    )
    tot = bkt_tot.agg(F.sum("btot").alias("w_total"))
    cum = (
        local.join(F.broadcast(offsets.select("bkt", "boff")), "bkt")
        .withColumn("cum", F.col("boff") + F.col("lcum"))
        .crossJoin(F.broadcast(tot))
        .withColumn("step", F.expr(f"greatest(w_total div {k}, 1)"))
    )
    return cum.filter(
        F.expr("(cum div step) > ((cum - w) div step)")
    ).select(
        "doc_id",
        "w",
        F.col("cum").alias("cum_w"),
        F.expr("cum div step").cast("long").alias("pick_idx"),
    )


QUERIES = {
    "sample_weighted": sample_weighted,
    "sample_mixture": sample_mixture,
    "sample_systematic": sample_systematic,
    "sample_stratified": sample_stratified,
    "reshape_unpivot": reshape_unpivot,
}

ORACLES = {
    # the oracle computes the SAME cumulative sum with one global window
    # (single-node engine: no distribution needed) — the two-phase
    # bucketed prefix sum must be arithmetically invisible
    "sample_weighted": """
        WITH rows AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ), cum AS (
            SELECT doc_id, w,
                   SUM(w) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(w) OVER () AS w_total
            FROM rows
        ), stepped AS (
            SELECT doc_id, w, cum, GREATEST(w_total // 100, 1) AS step
            FROM cum
        )
        SELECT doc_id, w, CAST(cum AS BIGINT) AS cum_w,
               CAST(cum // step AS BIGINT) AS pick_idx
        FROM stepped
        WHERE (cum // step) > ((cum - w) // step)
    """,
    "sample_mixture": """
        WITH counts AS (
            SELECT source, COUNT(*) AS c,
                   CAST(FLOOR(SQRT(COUNT(*)) * 1000 + 0.5) AS BIGINT) AS w
            FROM documents GROUP BY source
        ), tot AS (SELECT SUM(w) AS w_total FROM counts),
        quota AS (
            -- CAST: SUM(BIGINT) is HUGEINT in DuckDB -> pandas float64
            SELECT source, CAST((200 * w) // w_total AS BIGINT) AS n_quota
            FROM counts, tot
        ), ranked AS (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM documents
        )
        SELECT r.source, r.doc_id, CAST(r.rn AS BIGINT) AS rn, q.n_quota
        FROM ranked r JOIN quota q ON r.source = q.source
        WHERE r.rn <= q.n_quota
    """,
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
