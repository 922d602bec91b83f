"""Join operators over the star schema (SURVEY §2.2 — planned surface).

Strategy notes for 100 TB (verified against .explain in tests/test_plans.py):
* dims (region/nation/part/supplier) are explicitly ``broadcast()`` — no
  shuffle of the fact table for dim joins;
* fact⨝fact (lineitem⨝orders) is a shuffled hash/sort-merge join on the
  key both sides are already bucketable by — at scale, bucket both tables
  by orderkey to make this co-located;
* semi/anti joins use left_semi/left_anti (no payload duplication);
* the as-of join is a union+window single-shuffle plan, not a per-row
  subquery — O(n log n) per key-partition, no skew amplification.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ._util import dsum, scaled_long, sql_dsum

# Bucketed-table GENERATIONS written by join_bucketed_colocated, keyed
# PER SESSION (WeakKeyDictionary: the entry dies with its session, so a
# stale id() can never alias a new session's state). The returned frames
# are lazy, so the most recent generation must survive until the call
# after next: each call drops ITS OWN session's generations older than
# the previous one (keep-one, same policy as _scratch.scratch_dir) and
# never another session's — two sessions interleaving calls can no
# longer drop tables out from under each other's unread readers
# (round-4 review). All state transitions happen under _bucket_lock;
# names are registered BEFORE the table write so the one-time leftover
# sweep (below) can never reap a concurrent writer's half-written table.
import threading
import weakref

_bucket_tables: "weakref.WeakKeyDictionary[SparkSession, list[list[str]]]" = (
    weakref.WeakKeyDictionary()
)
_bucket_lock = threading.Lock()
_bucket_swept = False

_SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand — lineitem ⨝ broadcast(part)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(_disc_price(), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multiway join: revenue per nation where customer and
    supplier share the nation (fact⨝fact shuffle + broadcast dims)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(_disc_price(), 6).alias("revenue"))
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers left-joined to their order aggregates (nulls → 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_cnt"), dsum("o_totalprice").alias("spend")
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("order_cnt", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("total_spend"),
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer and supplier counts — rows
    survive from either side (nation sets need not coincide)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    sn = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one high-value order (left_semi ≍ EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order above 300k (left_anti ≍ NOT EXISTS) — the
    same plan shape as CDC tombstone filtering (SURVEY §2 S5)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order with
    o_orderdate <= event ts.

    Spark-first plan: tag both sides, union, then one window pass per key
    ordered by time — a single shuffle on user id, linear after sort. This
    scales where a per-row correlated subquery (the naive translation)
    would not. Oracle: DuckDB's native ASOF JOIN.
    """
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    probe = ev.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(1).alias("is_probe"),
    )
    build = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.lit(0).alias("is_probe"),
    )
    # build rows sort before probes at equal t (is_probe asc) so an event at
    # exactly t matches the order at t ("<=" semantics, ASOF default); ties
    # among equal-t build rows resolve to max o_orderkey in both engines
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_probe", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = probe.unionByName(build).withColumn(
        "matched_order",
        F.last(F.when(F.col("is_probe") == 0, F.col("o_orderkey")), ignorenulls=True).over(w),
    )
    return (
        unioned.filter(F.col("is_probe") == 1)
        .filter(F.col("matched_order").isNotNull())
        .select("event_id", F.col("uid").alias("user_id"), "matched_order")
    )


def join_asof_tolerance(
    spark: SparkSession, sf_dir: str, max_staleness_days: int = 9000
) -> DataFrame:
    """As-of join with a STALENESS BOUND — the point-in-time-correctness
    variant a feature store needs: a training example may only join the
    most recent feature value AND only if that value is fresher than
    ``max_staleness_days`` (a stale match is worse than no match — it
    leaks an obsolete world state into training). Same single-shuffle
    union+window plan as `join_asof`, additionally carrying the matched
    order's timestamp through the window so the staleness predicate is
    a post-filter, not a second join; staleness is exact integer
    datediff, so the boundary cannot flip between engines. The default
    bound is calibrated to the driver testdata's synthetic clock skew
    (orders predate events by ~8200-9800 days), so the filter KEEPS
    roughly half the matches — a real selection, not a no-op."""
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    probe = ev.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_t"),
        F.lit(1).alias("is_probe"),
    )
    build = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("o_t"),
        F.lit(0).alias("is_probe"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_probe", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_build = lambda c: F.last(
        F.when(F.col("is_probe") == 0, c), ignorenulls=True
    ).over(w)
    unioned = probe.unionByName(build).select(
        "*",
        last_build(F.col("o_orderkey")).alias("matched_order"),
        last_build(F.col("o_t")).alias("matched_t"),
    )
    staleness = F.datediff(F.to_date("t"), F.to_date("matched_t"))
    return (
        unioned.filter(F.col("is_probe") == 1)
        .filter(F.col("matched_order").isNotNull())
        .filter(staleness <= max_staleness_days)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            "matched_order",
            staleness.cast("long").alias("staleness_days"),
        )
    )


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with a range residual: lineitems whose quantity falls
    within ±5 of the part's size (theta condition evaluated post-probe)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey)
            & (li.l_quantity >= p.p_size - 5)
            & (li.l_quantity <= p.p_size + 5),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_in_range"))
    )


def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self interval join via time-bucketing: pairs of events by the same
    user within 5 minutes of each other. The naive form is a per-user
    theta join (quadratic in a hot user's events); bucketing by
    floor(t/300s) and probing the 3 adjacent buckets turns it into an
    equi join on (user, bucket) — the standard trick that makes interval
    joins hash-partitionable at any scale. Each qualifying pair matches in
    EXACTLY one bucket combination (the right row's own bucket), so no
    post-join dedup is needed. Timestamps compare as exact microseconds."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    width = 300 * 1_000_000  # 5 minutes in µs
    bucket = F.floor(F.col("us") / F.lit(width))
    left = e.select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("id_a"),
        F.col("us").alias("us_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bkt"),
    )
    right = e.select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("id_b"),
        F.col("us").alias("us_b"),
        bucket.alias("bkt"),
    )
    return (
        left.join(right, ["uid", "bkt"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= width)
        )
        .select(
            F.col("uid").alias("user_id"),
            "id_a",
            "id_b",
            ((F.col("us_b") - F.col("us_a")) / F.lit(1_000_000.0)).alias("gap_sec"),
        )
    )


def join_salted_skew(spark: SparkSession, sf_dir: str, n_salt: int = 8) -> DataFrame:
    """Skew-mitigated fact⨝dim join by explicit salting — the manual
    fallback when AQE's runtime skew split can't apply (e.g. the skewed
    side feeds a window, or the engine runs with AQE off). The big side
    tags each row with hash%n_salt; the small side replicates n_salt ways;
    the join key becomes (key, salt), so one hot key spreads over n_salt
    reducers. Result is IDENTICAL to the plain join (oracle = unsalted
    SQL); only the partitioning changes. Per-nation revenue through the
    supplier dim, deliberately forced through the shuffle path."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)).cast("int"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    salts = spark.range(n_salt).select(F.col("id").cast("int").alias("_salt"))
    s_rep = s.crossJoin(F.broadcast(salts))
    return (
        li.hint("shuffle_hash")
        .join(
            s_rep,
            (li.l_suppkey == s_rep.s_suppkey) & (li._salt == s_rep._salt),
        )
        .groupBy("s_nationkey")
        .agg(
            dsum(_disc_price(), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def join_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: orders priced above the global mean, counted
    per status. The mean is a 1-row aggregate broadcast into the scan (no
    shuffle of the fact side, one extra pass). The comparison is done in
    exact integers — ``price·n > Σprice`` on 10^2-scaled longs — so no row
    near the float threshold can flip between engines."""
    o = load_table(spark, sf_dir, "orders")
    tot = o.agg(
        F.sum(scaled_long("o_totalprice")).alias("s_total"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        o.join(F.broadcast(tot))
        .filter(scaled_long("o_totalprice") * F.col("n_total") > F.col("s_total"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            dsum("o_totalprice").alias("sum_above"),
        )
    )


def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⨝fact join via bucketed tables — the 100 TB lever
    the other join entries can't show: when BOTH sides are bucketed (and
    sort-ordered) on the join key with the same bucket count, the
    SortMergeJoin consumes the buckets' hash distribution directly and
    the plan has ZERO Exchange before the join (asserted in
    tests/test_plans.py). At scale this is the difference between
    re-shuffling 100 TB on every join and paying the shuffle ONCE at
    ingest; any number of subsequent key-joins reuse the layout free.

    Local mechanics: both facts are written to the session warehouse with
    ``bucketBy(8, key).sortBy(key)`` each call (the test-scale stand-in
    for the one-time ingest layout), then joined with a merge hint — the
    broadcast path would win at sf0.01 and hide the bucketing proof. The
    aggregate after the join shuffles only the tiny grouped result.
    Table names are per-call unique (returned frames are lazy, and
    concurrent callers must not clobber each other's buckets); table
    generations older than the previous call's are dropped here — per
    session, under a lock — to bound warehouse growth while the last
    result stays readable, and the first call per process sweeps
    leftover ``b_*`` dirs from dead processes (round-4 advice)."""
    global _bucket_swept
    import re
    import shutil
    import uuid
    from urllib.parse import urlparse

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    parsed = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    local_warehouse = parsed.path if parsed.scheme in ("", "file") else None
    run_id = uuid.uuid4().hex[:8]
    tables = {"orders": f"b_orders_{run_id}", "lineitem": f"b_lineitem_{run_id}"}
    generation = list(tables.values())
    stale: list[str] = []
    with _bucket_lock:
        gens = _bucket_tables.setdefault(spark, [])
        while len(gens) > 1:
            stale.extend(gens.pop(0))
        # register BEFORE writing: a concurrent sweep must see these live
        gens.append(generation)
        live = {n for g_list in _bucket_tables.values() for g in g_list for n in g}
        if not _bucket_swept and local_warehouse and os.path.isdir(local_warehouse):
            _bucket_swept = True
            pat = re.compile(r"^b_(orders|lineitem)_[0-9a-f]{8}$")
            stale.extend(
                e for e in os.listdir(local_warehouse) if pat.match(e) and e not in live
            )
    for name in stale:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass
        if local_warehouse:
            shutil.rmtree(os.path.join(local_warehouse, name), ignore_errors=True)
    for name, df, key in (
        (tables["orders"], o, "o_orderkey"),
        (tables["lineitem"], li, "l_orderkey"),
    ):
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    bo = spark.table(tables["orders"])
    bl = spark.table(tables["lineitem"])
    return (
        bl.hint("merge")
        .join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(_disc_price(), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULLABLE subquery — the three-valued-logic corner
    plain anti joins get wrong: `x NOT IN (set containing NULL)` is never
    true, and even without actual NULLs the planner must preserve that
    semantics once the subquery column is nullable (the `nullif` makes
    it so without changing the values). Spark plans this as a
    null-aware anti join (broadcast NAAJ) rather than the left-anti
    hash join `NOT EXISTS` gets — both engines agree on the SQL
    semantics, which is the point of the oracle. At scale the NAAJ
    build side must broadcast; rewriting to NOT EXISTS (null-free by
    construction) is the documented escape hatch when it can't."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_naaj")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_naaj")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders_naaj
        WHERE o_custkey NOT IN (
            SELECT nullif(c_custkey, -1) FROM customer_naaj
            WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
        """
    )


_BLOOM_M = 4096  # bits
_BLOOM_SALTS = [f"{i}:" for i in range(4)]


def _bloom_pos_sql(salt: str, key_col: str) -> str:
    """Portable Bloom bit position: md5-derived (the CMS discipline,
    `aggregates._cms_bucket_sql`) so Spark and DuckDB agree exactly."""
    return (
        f"CAST(conv(substring(md5(concat('{salt}', {key_col})), 1, 8), 16, 10)"
        f" AS BIGINT) % {_BLOOM_M}"
    )


def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled BLOOM runtime filter ahead of a semi join — the
    row-level twin of `join_dpp_partitioned`'s partition-level pruning,
    and the mechanism behind Spark's own runtime bloom-filter join,
    made deterministic so the oracle can prove it changes nothing: the
    build side's key set is folded into an m=4096-bit / 4-hash Bloom
    whose SET BIT POSITIONS are collected (bounded by m — never the
    keys, never data-scaled) and inlined as 64 long literals; the fact
    side tests its 4 md5-derived positions with narrow bit arithmetic —
    ZERO exchanges before the filter — and only survivors (true matches
    + ≲(fill)⁴ false positives) enter the exact semi join. At 100 TB
    this is the difference between shuffling every fact row and
    shuffling ~the matching fraction; no false negative is possible
    (every build-key bit is set), which is exactly what the plain
    semi-join oracle checks. Pruning effectiveness is asserted in
    tests/test_plans.py."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    # build: distinct set bit positions — ≤ m rows regardless of dim size
    pos_arrays = [
        F.expr(_bloom_pos_sql(s, "c_custkey")) for s in _BLOOM_SALTS
    ]
    positions = {
        r["p"]
        for r in c.select(F.explode(F.array(*pos_arrays)).alias("p"))
        .distinct()
        .collect()
    }
    words = [0] * (_BLOOM_M // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed long literals, inlined as one array
    bits_sql = "array({})".format(
        ", ".join(
            f"CAST({w - (1 << 64) if w >= 1 << 63 else w} AS BIGINT)" for w in words
        )
    )
    clauses = []
    for s in _BLOOM_SALTS:
        p = _bloom_pos_sql(s, "o_custkey")
        clauses.append(
            f"((shiftright(element_at({bits_sql}, CAST(({p}) div 64 AS INT) + 1),"
            f" CAST(({p}) % 64 AS INT)) & 1) = 1)"
        )
    prefiltered = o.filter(F.expr(" AND ".join(clauses)))
    return (
        prefiltered.join(c, prefiltered.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the partition-layout twin of
    `join_bucketed_colocated`: when the fact table is PARTITIONED on the
    join key and the dim side carries a runtime filter, Catalyst injects
    the dim's key set as a partition filter into the fact SCAN
    (`PartitionFilters: [dynamicpruning#...]`, asserted in
    tests/test_plans.py) — at 100 TB this is the difference between
    scanning every partition and touching only the months the dim
    selects, decided at RUNTIME (a static filter can't express "the
    months in quarter Q1 of the dim table" without reading the dim).

    Local mechanics: orders is written once per call to scratch parquet
    partitioned by order month (the ingest-layout stand-in), and a
    12-row month→quarter dim is written as a separate parquet so its
    filter value is genuinely data-dependent (a literal in-memory dim
    would constant-fold into static pruning and prove nothing). The dim
    broadcasts; the aggregate shuffles only the grouped result."""
    from .._scratch import scratch_dir

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.month("o_orderdate").alias("om")
    )
    fact_path = os.path.join(scratch_dir("dpp_"), "orders_by_month")
    o.write.mode("overwrite").partitionBy("om").parquet(fact_path)
    dim_path = os.path.join(os.path.dirname(fact_path), "month_dim")
    spark.createDataFrame(
        [(m, f"Q{(m - 1) // 3 + 1}") for m in range(1, 13)],
        "m int, quarter string",
    ).write.mode("overwrite").parquet(dim_path)

    # explicit schema: an empty corpus writes zero partition files and
    # schema inference would fail; the layout contract is known anyway
    fact = spark.read.schema("o_orderkey bigint, o_totalprice double, om int").parquet(
        fact_path
    )
    dim = spark.read.parquet(dim_path).filter(F.col("quarter") == "Q1")
    return (
        fact.join(F.broadcast(dim), fact.om == dim.m)
        .groupBy(F.col("om").cast("int").alias("om"))
        .agg(
            dsum("o_totalprice", 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT — the
    "top-2 orders for every BUILDING customer" shape. Catalyst cannot
    execute a per-outer-row subquery literally; `DecorrelateInnerQuery`
    rewrites the correlated LIMIT into a partitioned `row_number`
    filter, i.e. the planner derives the `win_topn_per_group` plan FROM
    the declarative SQL — same one keyed shuffle at scale, and the skew
    escape hatch (salted two-phase, `win_topn_salted`) applies
    unchanged. The oracle runs the identical LATERAL SQL on DuckDB
    (which executes it as a real dependent join) — two engines, two
    execution strategies, one certified result. Ties broken by
    o_orderkey so the top-2 set is deterministic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer_lat c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders_lat o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


QUERIES = {
    "join_lateral_topn": join_lateral_topn,
    "join_bloom_prefiltered": join_bloom_prefiltered,
    "join_dpp_partitioned": join_dpp_partitioned,
    "join_null_aware_anti": join_null_aware_anti,
    "join_broadcast_dim": join_broadcast_dim,
    "join_star_revenue": join_star_revenue,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_asof": join_asof,
    "join_asof_tolerance": join_asof_tolerance,
    "join_theta_range": join_theta_range,
    "join_scalar_subquery": join_scalar_subquery,
    "join_interval_bucketed": join_interval_bucketed,
    "join_salted_skew": join_salted_skew,
    "join_bucketed_colocated": join_bucketed_colocated,
}

ORACLES = {
    "join_lateral_topn": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    # the Bloom prefilter must be semantically invisible (no false
    # negatives by construction): oracle is the plain semi join
    "join_bloom_prefiltered": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
    """,
    # partition layout must not change the result: oracle is the plain
    # month filter (Q1 = months 1-3, the dim's quarter mapping)
    "join_dpp_partitioned": f"""
        SELECT CAST(month(o_orderdate) AS INT) AS om,
               {sql_dsum('o_totalprice', 2)} AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        WHERE month(o_orderdate) IN (1, 2, 3)
        GROUP BY 1
    """,
    "join_null_aware_anti": """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        WHERE o_custkey NOT IN (
            SELECT nullif(c_custkey, -1) FROM customer
            WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
    """,
    # bucketing must not change the result: oracle is the plain join
    "join_bucketed_colocated": f"""
        SELECT o_orderpriority,
               {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    # salting must not change the result: oracle is the plain join
    "join_salted_skew": f"""
        SELECT s_nationkey,
               {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    """,
    # the oracle is the NAIVE theta join — the bucketed plan must produce
    # the identical pair set
    "join_interval_bucketed": """
        SELECT a.user_id,
               a.event_id AS id_a, b.event_id AS id_b,
               (epoch_us(CAST(b.ts AS TIMESTAMP))
                - epoch_us(CAST(a.ts AS TIMESTAMP))) / 1000000.0 AS gap_sec
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND ABS(epoch_us(CAST(a.ts AS TIMESTAMP))
                 - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 300000000
    """,
    "join_scalar_subquery": f"""
        WITH t AS (
            SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS s_total,
                   COUNT(*) AS n_total
            FROM orders
        )
        SELECT o_orderstatus,
               COUNT(*) AS n_above,
               {sql_dsum("o_totalprice")} AS sum_above
        FROM orders, t
        WHERE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * n_total > s_total
        GROUP BY o_orderstatus
    """,
    "join_broadcast_dim": f"""
        SELECT p_brand,
               {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "join_star_revenue": f"""
        SELECT r_name, n_name, {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
        GROUP BY r_name, n_name
    """,
    "join_full_outer": """
        SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
               COALESCE(cn.n_customers, 0) AS n_customers,
               COALESCE(sn.n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey, COUNT(*) AS n_customers
              FROM customer GROUP BY c_nationkey) cn
        FULL OUTER JOIN
             (SELECT s_nationkey, COUNT(*) AS n_suppliers
              FROM supplier GROUP BY s_nationkey) sn
          ON cn.c_nationkey = sn.s_nationkey
    """,
    "join_left_outer": f"""
        SELECT c_custkey, c_mktsegment,
               COALESCE(order_cnt, 0) AS n_orders,
               COALESCE(spend, CAST(0.0 AS DOUBLE)) AS total_spend
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS order_cnt,
                   {sql_dsum("o_totalprice")} AS spend
            FROM orders GROUP BY o_custkey
        ) agg ON c_custkey = agg.o_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    "join_anti": """
        SELECT c_custkey, c_nationkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
    """,
    # as-of semantics from first principles (arg_max over the <= window),
    # with the same (date, orderkey) tie-break the Spark window uses —
    # DuckDB's native ASOF JOIN leaves equal-time ties unspecified
    "join_asof_tolerance": """
        WITH latest AS (
            SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ets,
                   MAX(o.o_orderdate) AS d
            FROM events e
            JOIN orders o
              ON o.o_custkey = e.user_id
             AND CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
            GROUP BY e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP)
        )
        SELECT l.event_id, l.user_id, MAX(o.o_orderkey) AS matched_order,
               CAST(datediff('day', CAST(l.d AS DATE), CAST(l.ets AS DATE))
                    AS BIGINT) AS staleness_days
        FROM latest l
        JOIN orders o ON o.o_custkey = l.user_id AND o.o_orderdate = l.d
        WHERE datediff('day', CAST(l.d AS DATE), CAST(l.ets AS DATE)) <= 9000
        GROUP BY l.event_id, l.user_id, l.d, l.ets
    """,
    "join_asof": """
        WITH latest AS (
            SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS d
            FROM events e
            JOIN orders o
              ON o.o_custkey = e.user_id
             AND CAST(o.o_orderdate AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
            GROUP BY e.event_id, e.user_id
        )
        SELECT l.event_id, l.user_id, MAX(o.o_orderkey) AS matched_order
        FROM latest l
        JOIN orders o ON o.o_custkey = l.user_id AND o.o_orderdate = l.d
        GROUP BY l.event_id, l.user_id
    """,
    "join_theta_range": """
        SELECT p_brand, COUNT(*) AS n_in_range
        FROM lineitem JOIN part
          ON l_partkey = p_partkey
         AND l_quantity >= p_size - 5
         AND l_quantity <= p_size + 5
        GROUP BY p_brand
    """,
}
