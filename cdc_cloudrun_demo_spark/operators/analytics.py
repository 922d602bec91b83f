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


def qx_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders served by MULTIPLE suppliers, find the one whose delivery was
    late (ship lag over 90 days past the order date — this schema has no
    receipt/commit dates) while every OTHER supplier shipped on time,
    and count such orders per supplier. The textbook formulation is one
    EXISTS plus one NOT EXISTS, each a correlated self-join of the fact
    table — three lineitem passes. Spark-first it collapses to ONE
    per-order aggregate: n_suppliers, n_late_suppliers, and (via max on
    a conditional) the identity of the single late supplier; an order
    qualifies iff n_suppliers > 1 and n_late_suppliers = 1. One shuffle
    on l_orderkey, one on the winning suppkey — the oracle keeps the
    EXISTS/NOT-EXISTS SQL, so two different algorithms must agree row
    for row. At 100 TB the fact table is scanned once instead of three
    times, and no self-join of lineitem ever materializes."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    per_order = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            # Q21 counts qualifying LINEITEM rows, not orders: a supplier
            # with two late lines in one order waits twice
            F.count(F.when(late, F.lit(1))).alias("n_late_items"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        per_order.groupBy("late_supp")
        .agg(F.sum("n_late_items").alias("numwait"))
        .join(s, per_order.late_supp == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"), "numwait")
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


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


def qx_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): top-10 unshipped BUILDING-
    segment orders by revenue. The revenue rank is computed on exact
    scaled longs, with (o_orderdate, l_orderkey) tie-breaks, so the
    LIMIT boundary is engine-deterministic; the top-10 compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-06-01"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-06-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(scaled_long(_disc_price(), 2)).alias("rev_s"))
        .orderBy(F.desc("rev_s"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("rev_s").cast("double") / F.lit(100.0)).alias("revenue"),
            "o_orderdate",
        )
    )


def qx_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): one scalar —
    Σ extendedprice·discount over a shipdate year, a discount band and a
    quantity cap. Pure scan+filter+agg: every predicate pushes to the
    parquet scan, no joins, no shuffle beyond the 1-row final agg. The
    discount band compares exact scaled ints (0.05..0.07 on doubles
    would be a float-boundary flip risk)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & scaled_long("l_discount", 2).between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def qx_conditional_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the schema has no shipmode column, so the CASE
    pivot runs on line status): per l_linestatus, how many 1997-shipped
    lineitems belong to URGENT/HIGH-priority orders vs the rest —
    conditional SUM(CASE) aggregation over a fact⨝fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def qx_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): PROMO-type revenue as a % of
    all revenue for one ship month. Both sums are exact scaled longs and
    the single double division happens once on the driver-side 1-row
    result, so the percentage is bit-identical across engines. The part
    dim broadcasts; the fact scans once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type") == "PROMO", _disc_price()
    ).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(scaled_long(promo, 6)).alias("s_promo"),
            F.sum(scaled_long(_disc_price(), 6)).alias("s_total"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("s_promo").cast("double")
                / F.col("s_total").cast("double")
            ).alias("promo_pct")
        )
    )


def qx_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunction of conjunctions): revenue from three
    OR'd brand/size/quantity bands. The join stays a single equality join
    on partkey — the disjunction is a residual filter, NOT a fallback to
    nested-loop; Catalyst also extracts the common l_quantity <= 30 bound
    for scan pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            dsum(_disc_price(), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def qx_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item losses): top-20 customers by revenue
    on 'R'-flagged lineitems in one order quarter. Revenue ranks on exact
    scaled longs with a custkey tie-break → deterministic LIMIT boundary,
    compiled to TakeOrderedAndProject (per-partition heaps)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(scaled_long(_disc_price(), 2)).alias("rev_s"))
        .orderBy(F.desc("rev_s"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_s").cast("double") / F.lit(100.0)).alias("revenue"),
            "c_acctbal",
        )
    )


def qx_supplier_part_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) for non-STANDARD types, from the
    lineitem fact (the schema has no partsupp table). COUNT(DISTINCT)
    shuffles the already-reduced (brand, type, size, suppkey) set, never
    raw lineitems twice."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "STANDARD")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def qx_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity orders): yearly-averaged revenue
    from lineitems below 20% of their part's mean quantity. The per-part
    mean is decorrelated into one tiny aggregate broadcast back onto the
    fact scan; the 20% threshold compares exact scaled longs cross-
    multiplied (qty·5·n < Σqty), so no float boundary can flip a row."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(scaled_long("l_quantity")).alias("s_qty"),
        F.count(F.lit(1)).alias("n_qty"),
    )
    per_part = per_part.select(F.col("l_partkey").alias("pk"), "s_qty", "n_qty")
    return (
        li.join(F.broadcast(per_part), li.l_partkey == F.col("pk"))
        .filter(scaled_long("l_quantity") * 5 * F.col("n_qty") < F.col("s_qty"))
        .agg(
            (
                F.sum(scaled_long("l_extendedprice", 2)).cast("double")
                / F.lit(100.0)
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def qx_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): per nation, customers
    with above-average positive balance and no RECENT (1999+) orders —
    the driver's synthetic data gives every customer some order, so the
    recency cut keeps the anti-join non-vacuous at every SF. The global
    average is a broadcast 1-row aggregate compared in exact scaled longs
    (bal·n > Σbal over positives); the no-orders probe is a left-anti
    join — never a per-customer subquery."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    pos = c.filter(F.col("c_acctbal") > 0)
    avg_agg = pos.agg(
        F.sum(scaled_long("c_acctbal")).alias("s_bal"),
        F.count(F.lit(1)).alias("n_bal"),
    )
    return (
        c.join(F.broadcast(avg_agg))
        .filter(scaled_long("c_acctbal") * F.col("n_bal") > F.col("s_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


def qx_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue between two trading
    nations per (supplier nation, customer nation, ship year), both
    directions. Supplier/customer/nation dims broadcast; the fact side
    shuffles once on the lineitem⨝orders key; year comes from the
    ship timestamp (engine-identical extraction both sides)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_disc_price(), 6).alias("revenue"))
    )


def qx_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of ASIA
    revenue per order year. The share is a conditional-sum ratio computed
    from two exact scaled-long sums with one double division per year
    row — no float accumulation anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp_n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.sum(scaled_long(_disc_price(), 2))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", scaled_long(_disc_price(), 2))
                .otherwise(F.lit(0).cast("long"))
            ).alias("s_nation"),
            vol.alias("s_all"),
        )
        .select(
            "o_year",
            (F.col("s_nation").cast("double") / F.col("s_all").cast("double")).alias(
                "mkt_share"
            ),
        )
    )


def qx_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per (supplier nation, ship
    year) profit on green-ish parts. The schema has no partsupp, so
    supplycost is adapted to 0.5·retailprice·quantity (documented,
    mirrored in the oracle); the profit expression folds to one exact
    scaled-long sum per group. Part/supplier/nation broadcast; one fact
    shuffle for the group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = _disc_price() - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(dsum(profit, 6).alias("sum_profit"))
    )


def qx_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): per-supplier revenue over one
    quarter, keeping exactly the supplier(s) that achieve the global
    maximum. The revenue view aggregates once (one shuffle on
    l_suppkey); the max is a 1-row aggregate of that view broadcast back
    into it — no second fact scan, no global sort. The equality test runs
    on exact 10^2-scaled longs, so a supplier whose revenue differs from
    the max by sub-cent float noise can never flip in or out; ties keep
    every argmax row in both engines (TPC-H's own Q15 semantics)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(scaled_long(_disc_price(), 2)).alias("rev_s")
    )
    top = rev.agg(F.max("rev_s").alias("max_s"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("rev_s") == F.col("max_s"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_s").cast("double") / F.lit(100.0)).alias("total_revenue"),
        )
    )


def qx_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel conversion (view → purchase within 1 hour): for every
    user with at least one 'view', the first view timestamp, whether any
    purchase lands in the (first_view, first_view + 1h] window, and the
    exact microsecond gap to the earliest such purchase (NULL when the
    funnel never converts).

    Shape: two pushed-down scans of the same events table (predicate on
    event_type reaches parquet), a groupBy(user_id) min for the view
    anchor, then a left range-join back to purchases on user_id — the
    range predicate rides on the hash join, so this is one shuffle per
    side keyed on user_id, never a cartesian. Per-user purchase counts
    are bounded, so no skew concern; the gap is integer microseconds
    (exact, no float threshold)."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view_ts"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (views.user_id == buys.p_user)
        & (buys.p_ts > views.first_view_ts)
        & (buys.p_ts <= views.first_view_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        views.join(buys, cond, "left")
        .groupBy("user_id", "first_view_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
        .select(
            "user_id",
            "first_view_ts",
            F.col("first_purchase_ts").isNotNull().alias("converted"),
            (
                F.unix_micros("first_purchase_ts") - F.unix_micros("first_view_ts")
            ).alias("gap_us"),
        )
    )


def qx_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the ISO week of their
    first signup event; for each (cohort_week, weeks_since) cell, the
    count of distinct cohort members active that week. The weeks_since
    offset is exact integer microsecond arithmetic (`div` on longs —
    Spark's `div` truncates toward zero and DuckDB's `//` floors, which
    agree because the week >= cohort_week filter keeps the operand
    non-negative). Plan: the cohort map is a per-user aggregate
    (broadcastable at any realistic user count... and the distinct
    activity grid is one shuffle on user_id); the matrix itself is tiny
    (weeks × weeks)."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
        .select("user_id", F.date_trunc("week", F.col("first_signup")).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    j = activity.join(cohorts, "user_id").filter(F.col("week") >= F.col("cohort_week"))
    return (
        j.withColumn(
            "weeks_since",
            F.expr("(unix_micros(week) - unix_micros(cohort_week)) div 604800000000"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


def qx_basket_lift(spark: SparkSession, sf_dir: str, min_cooc: int = 3) -> DataFrame:
    """Market-basket association mining: for every pair of parts
    co-ordered in ≥ ``min_cooc`` distinct orders, the support counts and
    the LIFT — P(a,b)/(P(a)·P(b)) — as an exact parts-per-million
    integer: lift_ppm = (cooc · n_orders · 10⁶) div (cnt_a · cnt_b).
    All-integer arithmetic keeps the ranking key exact (same discipline
    as TF-IDF's micro-nat scores), so the entry hash-matches its oracle.

    Plan shape at 100 TB: pair generation is the co-purchase self-join
    co-partitioned on l_orderkey (C(items,2) per order, bounded by the
    ≤7-item basket; a mega-basket needs the per-order cap first — the
    posting-list discipline), the per-part supports are ONE distinct
    aggregate reused for both sides of the pair via two broadcast-or-
    shuffle joins on the part key, and the min_cooc filter bounds the
    output before the lift math runs. The global n_orders scalar rides a
    broadcast crossJoin. int64 headroom: cooc·n_orders·10⁶ at 10¹⁰
    orders needs the 128-bit or decimal path — the dec_sum fallback
    class, documented not silently wrong."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.distinct()
    x, y = baskets.alias("x"), baskets.alias("y")
    pairs = (
        x.join(y, "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    cnt = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    n_orders = baskets.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return (
        pairs.join(cnt.select(F.col("l_partkey").alias("a"), F.col("cnt").alias("cnt_a")), "a")
        .join(cnt.select(F.col("l_partkey").alias("b"), F.col("cnt").alias("cnt_b")), "b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            "cooc",
            "cnt_a",
            "cnt_b",
            F.expr("cooc * n_orders * 1000000 div (cnt_a * cnt_b)").alias("lift_ppm"),
        )
    )


BASKET_LIFT_ORACLE = """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS cooc
        FROM baskets x JOIN baskets y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ), cnt AS (
        SELECT l_partkey, COUNT(*) AS cnt FROM baskets GROUP BY 1
    ), n AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets
    )
    SELECT p.a, p.b, p.cooc, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
           (p.cooc * n.n_orders * 1000000) // (ca.cnt * cb.cnt) AS lift_ppm
    FROM pairs p
    JOIN cnt ca ON ca.l_partkey = p.a
    JOIN cnt cb ON cb.l_partkey = p.b
    CROSS JOIN n
"""


def qx_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier (skyline) over (retail price ↓ better,
    size ↑ better): the parts no same-brand part dominates — the
    multi-objective shortlist query optimizers and product-analytics
    stacks both need. The naive skyline is an O(n²) dominance anti-join;
    this uses the sort-based 2D identity instead: over DISTINCT
    (price, size) points ordered (price asc, size desc), a point is
    dominated iff the running max of size over STRICTLY PRECEDING rows
    ≥ its size — every preceding row has no-worse price, so a preceding
    ≥ size point dominates (ties collapse via the pre-distinct). One
    window pass, no self-join.

    Scale shape: the window partitions by brand (the realistic skyline
    is always per-segment), so no global sort; a single giant partition
    would use the same identity hierarchically — per-partition frontier,
    then frontier-of-frontiers, exact because skylines are closed under
    union+refilter. Price is cents-scaled exact integer; the oracle runs
    the SAME window identity in DuckDB, and the property test certifies
    it against the quadratic dominance definition on a sample."""
    p = load_table(spark, sf_dir, "part")
    pts = (
        p.select(
            "p_brand",
            scaled_long("p_retailprice").alias("price_cents"),
            F.col("p_size").cast("long").alias("p_size"),
        )
        .groupBy("p_brand", "price_cents", "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    prev_max = F.expr(
        "max(p_size) over (partition by p_brand"
        " order by price_cents asc, p_size desc"
        " rows between unbounded preceding and 1 preceding)"
    )
    return (
        pts.withColumn("prev_max_size", prev_max)
        .filter(F.col("prev_max_size").isNull() | (F.col("prev_max_size") < F.col("p_size")))
        .select("p_brand", "price_cents", "p_size", "n_parts")
    )


PARETO_ORACLE = """
    WITH pts AS (
        SELECT p_brand,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS p_size,
               COUNT(*) AS n_parts
        FROM part GROUP BY 1, 2, 3
    ), flagged AS (
        SELECT p_brand, price_cents, p_size, n_parts,
               MAX(p_size) OVER (PARTITION BY p_brand
                   ORDER BY price_cents ASC, p_size DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_size
        FROM pts
    )
    SELECT p_brand, price_cents, p_size, n_parts
    FROM flagged
    WHERE prev_max_size IS NULL OR prev_max_size < p_size
"""


QUERIES = {
    "qx_basket_lift": qx_basket_lift,
    "qx_pareto_frontier": qx_pareto_frontier,
    "qx_retention_cohorts": qx_retention_cohorts,
    "qx_top_supplier": qx_top_supplier,
    "qx_funnel_conversion": qx_funnel_conversion,
    "qx_priority_exists": qx_priority_exists,
    "qx_correlated_max": qx_correlated_max,
    "qx_large_orders": qx_large_orders,
    "qx_local_supplier_volume": qx_local_supplier_volume,
    "qx_custdist": qx_custdist,
    "qx_waiting_suppliers": qx_waiting_suppliers,
    "qx_having": qx_having,
    "qx_nested_agg": qx_nested_agg,
    "qx_shipping_priority": qx_shipping_priority,
    "qx_forecast_revenue": qx_forecast_revenue,
    "qx_conditional_shipmode": qx_conditional_shipmode,
    "qx_promo_revenue": qx_promo_revenue,
    "qx_disjunctive_pred": qx_disjunctive_pred,
    "qx_returned_items": qx_returned_items,
    "qx_supplier_part_dist": qx_supplier_part_dist,
    "qx_small_qty_revenue": qx_small_qty_revenue,
    "qx_sales_opportunity": qx_sales_opportunity,
    "qx_nation_volume": qx_nation_volume,
    "qx_market_share": qx_market_share,
    "qx_product_profit": qx_product_profit,
}

ORACLES = {
    "qx_basket_lift": BASKET_LIFT_ORACLE,
    "qx_pareto_frontier": PARETO_ORACLE,
    "qx_retention_cohorts": """
        WITH s AS (
            SELECT user_id, MIN(ts) AS first_signup
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), c AS (
            SELECT user_id,
                   date_trunc('week', CAST(first_signup AS TIMESTAMP)) AS cohort_week
            FROM s
        ), a AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
            FROM events
        )
        SELECT c.cohort_week,
               (epoch_us(a.week) - epoch_us(c.cohort_week)) // 604800000000
                 AS weeks_since,
               COUNT(DISTINCT a.user_id) AS n_active_users
        FROM a JOIN c ON a.user_id = c.user_id
        WHERE a.week >= c.cohort_week
        GROUP BY 1, 2
    """,
    "qx_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS rev_s
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(rev_s AS DOUBLE) / 100.0 AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_s = (SELECT MAX(rev_s) FROM rev)
    """,
    "qx_funnel_conversion": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS first_view_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), p AS (
            SELECT user_id AS p_user, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT v.user_id, v.first_view_ts,
               (MIN(p.p_ts) IS NOT NULL) AS converted,
               epoch_us(CAST(MIN(p.p_ts) AS TIMESTAMP))
                 - epoch_us(CAST(v.first_view_ts AS TIMESTAMP)) AS gap_us
        FROM v LEFT JOIN p
          ON v.user_id = p.p_user
         AND p.p_ts >  v.first_view_ts
         AND p.p_ts <= v.first_view_ts + INTERVAL 1 HOUR
        GROUP BY v.user_id, v.first_view_ts
    """,
    "qx_nation_volume": f"""
        SELECT supp_nation, cust_nation, l_year,
               {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(YEAR(l_shipdate) AS INT) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) t
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "qx_market_share": """
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                    THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY CAST(YEAR(o_orderdate) AS INT)
    """,
    "qx_product_profit": f"""
        SELECT n_name AS nation, CAST(YEAR(l_shipdate) AS INT) AS o_year,
               {sql_dsum("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity", 6)}
                 AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'PROMO'
        GROUP BY n_name, CAST(YEAR(l_shipdate) AS INT)
    """,
    "qx_returned_items": """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
               c_acctbal
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, c_acctbal
        ORDER BY SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                 AS BIGINT)) DESC, c_custkey ASC
        LIMIT 20
    """,
    "qx_supplier_part_dist": """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'STANDARD'
        GROUP BY p_brand, p_type, p_size
    """,
    "qx_small_qty_revenue": """
        WITH per_part AS (
            SELECT l_partkey AS pk,
                   SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS s_qty,
                   COUNT(*) AS n_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem JOIN per_part ON l_partkey = pk
        WHERE CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) * 5 * n_qty < s_qty
    """,
    "qx_sales_opportunity": f"""
        WITH avg_agg AS (
            SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS s_bal,
                   COUNT(*) AS n_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, COUNT(*) AS numcust,
               {sql_dsum("c_acctbal")} AS totacctbal
        FROM customer, avg_agg
        WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) * n_bal > s_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
    """,
    "qx_shipping_priority": """
        SELECT l_orderkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
               o_orderdate
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate  > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                 AS BIGINT)) DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    "qx_forecast_revenue": f"""
        SELECT {sql_dsum("l_extendedprice * l_discount", 6)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    "qx_conditional_shipmode": """
        SELECT l_linestatus,
               -- CASTs: DuckDB SUM(int) is HUGEINT -> pandas float64,
               -- which breaks strict value hashing vs Spark's int64
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    "qx_promo_revenue": """
        SELECT 100.0 * CAST(SUM(CAST(FLOOR(
                 CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(FLOOR(
                 l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
                 AS BIGINT)) AS DOUBLE) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    "qx_disjunctive_pred": f"""
        SELECT {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue, COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
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
    "qx_waiting_suppliers": """
        WITH fo AS (
            SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT s.s_name, n.n_name AS nation, COUNT(*) AS numwait
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey,
             lineitem l1 JOIN fo o ON l1.l_orderkey = o.o_orderkey
        WHERE l1.l_suppkey = s.s_suppkey
          AND date_diff('day', o.o_orderdate, l1.l_shipdate) > 90
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3 JOIN fo o3 ON l3.l_orderkey = o3.o_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND date_diff('day', o3.o_orderdate, l3.l_shipdate) > 90
          )
        GROUP BY s.s_name, n.n_name
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
