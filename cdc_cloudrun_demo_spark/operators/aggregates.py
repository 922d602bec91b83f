"""Aggregation operators: group-by, distinct, rollup/cube, top-k, histograms.

The reference's only aggregates are bash-loop mean/min/max
(``unified_performance_test.sh:201-208,376-445``); SURVEY §2.2 plans the
full surface. All partial/final aggregation splitting is Catalyst-automatic
(map-side combine before the shuffle), which is what keeps these viable at
100 TB: the shuffle carries one row per group per partition, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ._util import davg, dec_sum, dsum, scaled_long, sql_davg, sql_dsum

def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _charge():
    return (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )


_SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_SQL_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → groupBy → agg).
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") <= 45)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(_disc_price(), 6).alias("sum_disc_price"),
            dsum(_charge(), 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def agg_pricing_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pricing summary on the DECIMAL(18,s) path — the documented
    ultra-scale fallback of the scaled-long discipline (`_util` module
    docstring: past ~9e7 rows·10^s the long sums can overflow 2^63;
    decimal sums cannot until 10^(38-s)). This entry EXISTS to keep that
    fallback continuously proven: same grouping, same filter, sums via
    `dec_sum`, hash-matched against DuckDB's own DECIMAL arithmetic —
    so flipping `dsum = dec_sum` for a >sf1000 deployment is a tested
    path, not a comment. Decimal aggregation runs outside codegen's
    primitive path (~6× slower per the measured note in _util) — the
    measured price of overflow immunity, which is exactly why BOTH
    entries exist."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") <= 45)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(_disc_price(), 6).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# approx_count_distinct (HLL++): values won't match DuckDB's approximation
# → rows-only check; tests assert ≤2% relative error vs the exact count.
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region→nation with GROUPING() disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # grouping() must be computed inside the agg (it only resolves under
    # the Expand node Catalyst plants for rollup/cube)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        dsum(_disc_price(), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def agg_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


def agg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by exact revenue (sort → limit = TakeOrderedAndProject;
    no full sort materializes at scale). Decimal sums make the ordering
    engine-exact; o_custkey breaks ties."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("revenue"))
    return rev.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(10)


def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value (bucket = floor(value/50))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value"))
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per order status (median + p90).
    Spark `percentile` and DuckDB `quantile_cont` both linearly
    interpolate on the sorted values; 6-dp rounding absorbs the last-ulp
    interpolation drift. At 100 TB exact percentile sorts per group —
    switch to `approx_percentile` (t-digest) when groups stop fitting a
    task; the oracle contract then weakens to rows-only like the HLL op."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG shape): region names per
    region-group of nations. Sorting inside the aggregate makes the
    result order-deterministic across engines and partitionings."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


def agg_conditional_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause-style conditional aggregation: several differently-
    predicated aggregates in ONE pass over the fact table (the alternative
    — one scan per predicate — is a 100 TB anti-pattern). Spark spells it
    count/sum(CASE WHEN); the oracle uses SQL FILTER; identical values."""
    l = load_table(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    high_disc = F.col("l_discount") >= 0.05
    return l.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(returned, 1)).alias("n_returned"),
        (F.sum(F.when(high_disc, scaled_long("l_extendedprice"))).cast("double")
         / F.lit(100.0)).alias("high_disc_price"),
        F.count(F.when(returned & high_disc, 1)).alias("n_both"),
    )


def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev / variance / correlation /
    covariance / regression slope) computed from exact scaled-long power
    sums rather than the engines' native stddev/corr aggregates: the
    native single-pass moment algorithms accumulate doubles in partition
    order, so their last ulps differ across engines AND across runs. The
    power sums (Σx, Σx², Σy, Σy², Σxy on 10^2-scaled integers) are exact
    and order-insensitive; the closed-form combination into moments is one
    identical double expression on both sides. Same map-side-combine
    scalability as any hash aggregate — the shuffle carries 6 longs per
    group per partition."""
    l = load_table(spark, sf_dir, "lineitem")
    x = scaled_long("l_quantity")   # quantity × 100, exact integer
    y = scaled_long("l_discount")   # discount × 100, exact integer
    sums = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = (sxx - sx * sx / n) / (n - F.lit(1.0))  # of 100·x
    var_y = (syy - sy * sy / n) / (n - F.lit(1.0))
    cov = (sxy - sx * sy / n) / (n - F.lit(1.0))
    return sums.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(F.sqrt(var_x) / F.lit(100.0), 6).alias("sd_qty"),
        F.round(var_x / F.lit(10000.0), 6).alias("var_qty"),
        F.round(cov / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias("corr_qty_disc"),
        F.round(cov / F.lit(10000.0), 6).alias("covar_qty_disc"),
        F.round(cov / var_x, 6).alias("slope_disc_on_qty"),
    )


def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL-style percentile_approx sketch
    (mergeable partial sketches → one pass, bounded memory — the 100 TB
    path where exact percentiles' full sort is off the table). Sketch
    output is engine-specific → rows-only check; accuracy vs the exact
    quantiles is asserted in tests/test_llm_ops.py."""
    o = load_table(spark, sf_dir, "orders")
    pa = F.percentile_approx("o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), 10000)
    return o.groupBy("o_orderstatus").agg(
        pa.getItem(0).alias("approx_p50"),
        pa.getItem(1).alias("approx_p90"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (per-status, per-priority, grand total)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n,
               {sql_dsum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent hour-of-day per event type,
    with smallest-hour tie-break and the mode's share of the group.

    Built-in `mode()` (Spark ≥3.4 and DuckDB both have one) is
    NON-deterministic on ties — whichever value a partial aggregate saw
    first wins — so this is the two-phase form an engine must use when
    results feed an exact contract: count per (group, value) — map-side
    combined, shuffle carries one row per distinct pair — then a
    row_number window over the tiny counts table with an explicit
    (count DESC, value ASC) order. The share is one double division of
    two exact longs, identical in any engine."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select("event_type", F.hour("ts").cast("int").alias("hod"))
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("modal_count"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("modal_count"), F.asc("hod")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_total", F.sum("modal_count").over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hod").alias("modal_hour"),
            "modal_count",
            (
                F.col("modal_count").cast("double")
                / F.col("n_total").cast("double")
            ).alias("modal_share"),
        )
    )


def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct count: each time segment builds its own
    HLL sketch (`hll_sketch_agg`), the partial sketches union
    (`hll_union_agg`), and the estimate reads off the merged sketch —
    the incremental-refresh twin of `cdc_incremental_agg` for the
    NON-self-maintainable COUNT(DISTINCT). HLL merge is lossless (the
    merged register array equals the array a whole-corpus sketch would
    hold), so segment-then-merge gives bit-identical estimates to a
    single pass — asserted as an exact equality in
    tests/test_properties.py. Rows-only entry: the sketch binary and
    estimator are engine-specific (DataSketches), so no DuckDB oracle;
    the property test is the contract. At 100 TB this is how per-day
    distinct-user counts roll up to months without rescanning history:
    store one ~4 KB sketch per partition, merge at query time."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-20").cast("timestamp")
    a = ev.filter(F.col("ts") < split).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    b = ev.filter(F.col("ts") >= split).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        a.unionAll(b)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("n_distinct_users_est"))
    )


def agg_quantile_sketch_merge(
    spark: SparkSession, sf_dir: str, k: int = 256
) -> DataFrame:
    """Mergeable QUANTILE sketch — the percentile twin of
    `agg_hll_merge`, closing the sketch-merge family for the other big
    non-self-maintainable aggregate. The sketch is a bottom-k sample by
    a deterministic hash (the KMV construction): keeping the k rows with
    the smallest md5(o_orderkey) is a uniform sample of the keys, and
    the merge — union the per-segment sketches, keep the global
    bottom-k — is ASSOCIATIVE and order-independent, so
    segment-then-merge equals the sketch a single whole-corpus pass
    would build (bit-identical, not just approximately: the bottom-k
    set is a pure function of the membership). Per-month segments here;
    at 100 TB each partition stores its k-row sketch and a refresh
    merges |segments|·k rows, never the raw history.

    Everything — the hash ranking, the merge, the quantile read-off
    (ceil(p·k)-th element of the sample ordered by (value, hash)) — is
    deterministic SQL reproduced exactly by the DuckDB oracle, so this
    sketch gets a full hash-match check where engine-opaque sketches
    (HLL) get rows-only + property tests. Sampling accuracy vs the
    exact percentiles is asserted separately in tests/test_properties.py."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    seg = orders.select(
        F.month("o_orderdate").alias("m"), "o_totalprice", h.alias("h")
    )
    per_seg = Window.partitionBy("m").orderBy("h")
    sketches = (
        seg.withColumn("rn", F.row_number().over(per_seg))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    merged = sketches.orderBy("h").limit(k)
    by_value = Window.orderBy("o_totalprice", "h")
    # Rank picks come from the OBSERVED sample count, not the nominal k:
    # a corpus yielding fewer than k sketch rows would otherwise read
    # quantiles at ranks that don't exist and silently return NULL
    # (round-5 advice). ceil(p·nk) via the all-positive integer form
    # (p100·nk + 99) div 100 — Spark `div` truncates toward zero while
    # DuckDB `//` floors, so the negated-ceil trick would diverge on the
    # intermediate negatives; this form stays positive in both engines.
    ranked = (
        merged.withColumn("r", F.row_number().over(by_value))
        .withColumn("nk", F.max("r").over(Window.partitionBy()))
    )
    def _pick(p100: int):
        return F.expr(f"({p100} * nk + 99) div 100")
    return ranked.agg(
        F.count(F.lit(1)).alias("sample_k"),
        F.count_distinct("m").alias("n_segments_sampled"),
        F.max(F.when(F.col("r") == _pick(50), F.col("o_totalprice"))).alias("p50"),
        F.max(F.when(F.col("r") == _pick(90), F.col("o_totalprice"))).alias("p90"),
        F.max(F.when(F.col("r") == _pick(99), F.col("o_totalprice"))).alias("p99"),
    )


_CMS_D, _CMS_W = 4, 256
_CMS_SALTS = [f"{i}:" for i in range(_CMS_D)]
_CMS_PROBES = [1, 2, 5]


def _cms_bucket_sql(salt_col: str, key_col: str) -> str:
    """Portable bucket hash: first 8 hex chars of md5(salt||key) as an
    integer, mod w. Spark `conv(hex,16,10)` and DuckDB `('0x'||hex)::
    BIGINT` parse the identical md5 hex substring to the identical
    nonnegative value (< 2^32), so both engines place every key in the
    same counter cell — the whole sketch is hash-oracle-able where
    engine-seeded CMS implementations are not."""
    return (
        f"CAST(conv(substring(md5(concat({salt_col}, {key_col})), 1, 8), 16, 10)"
        f" AS BIGINT) % {_CMS_W}"
    )


def agg_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable COUNT-MIN sketch — the frequency twin of the KMV
    quantile sketch, closing the third big mergeable-sketch family
    (distinct=HLL, quantiles=KMV, frequencies=CMS). d=4 hash rows ×
    w=256 counters; a key's estimate is min_i counts[i][bucket_i(key)],
    an overestimate by construction (collisions only ever ADD). The
    sketch is built per month-segment and MERGED by cell-wise summation
    — sums are associative and order-independent, so segment-then-merge
    equals the whole-corpus sketch exactly (the property a 100 TB
    per-partition sketch refresh depends on: |segments|·d·w counter
    rows into the merge, never the raw history; map-side partial
    aggregation bounds the first shuffle the same way).

    Bucket hashes are md5-derived and reproduced exactly by DuckDB
    (`_cms_bucket_sql`) → full hash-match check, where engine-seeded
    sketches (HLL) get rows-only. Output: probe-key estimates joined
    with exact counts; estimate ≥ exact for EVERY key and exact
    mergeability are property-tested in tests/test_properties.py."""
    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.month("o_orderdate").alias("m"),
        F.col("o_custkey").cast("string").alias("k"),
    )
    salts = F.array(*[F.lit(s) for s in _CMS_SALTS])
    hashed = rows.select("m", "k", F.explode(salts).alias("s"))
    seg = hashed.groupBy(
        "m", "s", F.expr(_cms_bucket_sql("s", "k")).alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = seg.groupBy("s", "b").agg(F.sum("c").alias("c"))

    probes = spark.createDataFrame([(str(p),) for p in _CMS_PROBES], "k string")
    pb = probes.select("k", F.explode(salts).alias("s")).select(
        "k", "s", F.expr(_cms_bucket_sql("s", "k")).alias("b")
    )
    # LEFT join: a probe key whose cell no data row touched estimates 0
    # (an empty cell is a 0 counter, not a missing row)
    est = (
        pb.join(merged, ["s", "b"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("estimate"))
    )
    exact = (
        orders.filter(F.col("o_custkey").isin(_CMS_PROBES))
        .groupBy(F.col("o_custkey").cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        est.join(exact, "k", "left")
        .select(
            F.col("k").cast("long").alias("probe_key"),
            F.col("estimate").cast("long").alias("estimate"),
            F.coalesce(F.col("exact_cnt"), F.lit(0)).cast("long").alias("exact_cnt"),
        )
    )


_BM_WORD = 63  # bits per bitmap word; 63 keeps every shift in signed-positive
               # BIGINT range (1<<63 overflows DuckDB's signed left shift)


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via fixed-width bitmap words — the
    roaring-bitmap/ClickHouse `groupBitmap` pattern recast in pure SQL:
    a key k sets bit ``k % 63`` of word ``k div 63``; per (month, word)
    the masks OR-combine (``bit_or`` — associative, idempotent, order-
    independent), and the month's exact distinct count is the sum of
    popcounts over its words. Unlike count(DISTINCT), the word masks are
    MERGEABLE state: at 100 TB each partition keeps its (word → mask)
    rows (≤ keyspace/63 rows, 8 bytes each — o_custkey space / 63 words
    regardless of row count), a segment refresh re-ORs only touched
    words, and the global count never rescans raw history. Map-side
    partial ``bit_or`` collapses the first shuffle to one row per
    (month, word) per task. The exact twin `n_distinct_exact`
    (count(DISTINCT)) rides along so the oracle proves bitmap == exact
    row-by-row; OR-merge associativity across arbitrary segment splits
    is property-tested in tests/test_properties.py."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.month("o_orderdate").alias("m"),
        (F.col("o_custkey") % _BM_WORD).cast("int").alias("bit"),
        F.expr(f"o_custkey div {_BM_WORD}").alias("word"),
    )
    words = keyed.groupBy("m", "word").agg(
        # expr(): the Python shiftleft binding takes only a literal shift
        # count; the SQL function accepts a column
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("mask")
    )
    bm = words.groupBy("m").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct_bitmap"),
        F.count(F.lit(1)).alias("n_words"),
    )
    exact = orders.groupBy(F.month("o_orderdate").alias("m")).agg(
        F.countDistinct("o_custkey").alias("n_distinct_exact")
    )
    return bm.join(exact, "m").select(
        "m", "n_distinct_bitmap", "n_distinct_exact", "n_words"
    )


_KMV_K = 256
_KMV_SPLIT = "1995-01-01"
# 2^60 — the first 15 md5 hex chars as a fraction of the hash space; both
# engines parse the identical substring to the identical integer < 2^60
_KMV_SPACE = float(1 << 60)


def agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch SET OPERATIONS — distinct-set
    union/intersection/Jaccard estimated from two bottom-k sketches
    without touching the raw sets, the theta-sketch workflow a 100 TB
    dedup/audit pipeline uses to compare corpus segments (here: the
    customer sets ordering before vs since 1995). Each side keeps the k
    smallest md5 hashes of its DISTINCT keys (bottom-k of a uniform hash
    = uniform sample of the set); the sketches MERGE by union-then-
    bottom-k (associative, so per-partition sketches combine in any
    order), Jaccard is estimated by the intersection share *within the
    merged sketch*, the union cardinality by the classic (k-1)/h_k
    estimator on the k-th smallest hash as a fraction of the hash space
    (exact-count fallback when the union sketch isn't full — the
    standard KMV rule). Every step — hashing, ranking, the estimator
    division — is deterministic SQL reproduced exactly by DuckDB, so
    this *estimator* gets a full hash-match check where engine-seeded
    sketches (HLL) get rows-only. Exact |A∩B|/|A∪B| ride along for the
    oracle to certify; estimator error bounds are property-tested."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(_KMV_SPLIT).cast("date")

    def sketch(side_filter, tag: str) -> DataFrame:
        keys = (
            orders.filter(side_filter)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
            .select("k", F.md5(F.col("k").cast("string")).alias("h"))
        )
        w = Window.orderBy("h")
        # bounded: ≤ k rows survive; the global window runs over the
        # per-partition bottom-k pre-prune Spark's TakeOrdered-style
        # limit gives LIMIT-by-sort; at scale swap for the two-phase
        # top-k (win_topn_salted) — semantics identical
        return (
            keys.orderBy("h")
            .limit(_KMV_K)
            .select("h", F.lit(tag).alias("side"))
        )

    a = sketch(F.col("o_orderdate") < split, "a")
    b = sketch(F.col("o_orderdate") >= split, "b")
    both = a.select("h").unionAll(b.select("h")).distinct()
    merged = both.orderBy("h").limit(_KMV_K)
    flags = (
        merged.join(a.select("h", F.lit(1).alias("in_a")), "h", "left")
        .join(b.select("h", F.lit(1).alias("in_b")), "h", "left")
    )
    hk_frac = (
        F.expr("CAST(conv(substring(max(h), 1, 15), 16, 10) AS DOUBLE)")
        / F.lit(_KMV_SPACE)
    )
    est = flags.agg(
        F.count(F.lit(1)).alias("k_merged"),
        F.sum(
            F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("k_inter"),
        hk_frac.alias("hk_frac"),
    )
    cust_sets = orders.select(
        "o_custkey", (F.col("o_orderdate") < split).alias("early")
    ).groupBy("o_custkey").agg(
        F.max(F.when(F.col("early"), 1).otherwise(0)).alias("in_a"),
        F.max(F.when(~F.col("early"), 1).otherwise(0)).alias("in_b"),
    )
    exact = cust_sets.agg(
        F.count(F.lit(1)).alias("n_union_exact"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_inter_exact"),
    )
    return est.crossJoin(exact).select(
        "k_merged",
        "k_inter",
        (F.col("k_inter").cast("double") / F.col("k_merged").cast("double")).alias(
            "jaccard_est"
        ),
        F.when(
            F.col("k_merged") < _KMV_K, F.col("k_merged").cast("double")
        )
        .otherwise(F.lit(float(_KMV_K - 1)) / F.col("hk_frac"))
        .alias("n_union_est"),
        "n_union_exact",
        "n_inter_exact",
        (
            F.col("n_inter_exact").cast("double")
            / F.col("n_union_exact").cast("double")
        ).alias("jaccard_exact"),
    )


QUERIES = {
    "agg_bitmap_distinct": agg_bitmap_distinct,
    "agg_kmv_setops": agg_kmv_setops,
    "agg_cms_merge": agg_cms_merge,
    "agg_quantile_sketch_merge": agg_quantile_sketch_merge,
    "agg_hll_merge": agg_hll_merge,
    "agg_mode": agg_mode,
    "agg_pricing_summary": agg_pricing_summary,
    "agg_pricing_decimal": agg_pricing_decimal,
    "agg_distinct_counts": agg_distinct_counts,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_rollup_revenue": agg_rollup_revenue,
    "agg_cube_counts": agg_cube_counts,
    "agg_top_customers": agg_top_customers,
    "agg_value_histogram": agg_value_histogram,
    "agg_percentiles": agg_percentiles,
    "agg_string_concat": agg_string_concat,
    "agg_conditional_sums": agg_conditional_sums,
    "agg_approx_percentiles": agg_approx_percentiles,
    "agg_stats_moments": agg_stats_moments,
    "agg_grouping_sets": agg_grouping_sets,
}

# Shared double sub-expressions for the moments oracle — identical shape to
# the Spark column expressions so both engines run one IEEE-754 chain.
_SQL_VX = "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"
_SQL_VY = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"
_SQL_COV = "((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"

ORACLES = {
    "agg_bitmap_distinct": f"""
        WITH keyed AS (
            SELECT month(o_orderdate) AS m,
                   CAST(o_custkey % {_BM_WORD} AS INT) AS bit,
                   o_custkey // {_BM_WORD} AS word
            FROM orders
        ), words AS (
            SELECT m, word, bit_or(1::BIGINT << bit) AS mask
            FROM keyed GROUP BY 1, 2
        ), bm AS (
            SELECT m, CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct_bitmap,
                   COUNT(*) AS n_words
            FROM words GROUP BY 1
        ), exact AS (
            SELECT month(o_orderdate) AS m,
                   COUNT(DISTINCT o_custkey) AS n_distinct_exact
            FROM orders GROUP BY 1
        )
        SELECT bm.m, n_distinct_bitmap, n_distinct_exact, n_words
        FROM bm JOIN exact ON bm.m = exact.m
    """,
    "agg_kmv_setops": f"""
        WITH a AS (
            SELECT md5(CAST(k AS VARCHAR)) AS h FROM (
                SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate < DATE '{_KMV_SPLIT}'
            ) ORDER BY h LIMIT {_KMV_K}
        ), b AS (
            SELECT md5(CAST(k AS VARCHAR)) AS h FROM (
                SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate >= DATE '{_KMV_SPLIT}'
            ) ORDER BY h LIMIT {_KMV_K}
        ), merged AS (
            SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
            ORDER BY h LIMIT {_KMV_K}
        ), est AS (
            SELECT COUNT(*) AS k_merged,
                   CAST(SUM(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS k_inter,
                   CAST(('0x' || substr(MAX(m.h), 1, 15)) AS BIGINT)
                     / CAST({_KMV_SPACE!r} AS DOUBLE) AS hk_frac
            FROM merged m
            LEFT JOIN a ia ON ia.h = m.h
            LEFT JOIN b ib ON ib.h = m.h
        ), cust_sets AS (
            SELECT o_custkey,
                   MAX(CASE WHEN o_orderdate < DATE '{_KMV_SPLIT}' THEN 1 ELSE 0 END) AS in_a,
                   MAX(CASE WHEN o_orderdate >= DATE '{_KMV_SPLIT}' THEN 1 ELSE 0 END) AS in_b
            FROM orders GROUP BY 1
        ), exact AS (
            SELECT COUNT(*) AS n_union_exact,
                   CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_inter_exact
            FROM cust_sets
        )
        SELECT k_merged, k_inter,
               CAST(k_inter AS DOUBLE) / CAST(k_merged AS DOUBLE) AS jaccard_est,
               CASE WHEN k_merged < {_KMV_K} THEN CAST(k_merged AS DOUBLE)
                    ELSE CAST({float(_KMV_K - 1)!r} AS DOUBLE) / hk_frac
               END AS n_union_est,
               n_union_exact, n_inter_exact,
               CAST(n_inter_exact AS DOUBLE) / CAST(n_union_exact AS DOUBLE)
                 AS jaccard_exact
        FROM est CROSS JOIN exact
    """,
    "agg_cms_merge": f"""
        WITH rows AS (
            SELECT month(o_orderdate) AS m, CAST(o_custkey AS VARCHAR) AS k
            FROM orders
        ), h AS (
            SELECT m, k, unnest(['0:', '1:', '2:', '3:']) AS s FROM rows
        ), hb AS (
            SELECT m, s,
                   CAST(('0x' || substr(md5(s || k), 1, 8)) AS BIGINT)
                     % {_CMS_W} AS b
            FROM h
        ), seg AS (
            SELECT m, s, b, COUNT(*) AS c FROM hb GROUP BY 1, 2, 3
        ), merged AS (
            SELECT s, b, SUM(c) AS c FROM seg GROUP BY 1, 2
        ), probes AS (
            SELECT unnest(['1', '2', '5']) AS k
        ), pb AS (
            SELECT p.k, sl.s,
                   CAST(('0x' || substr(md5(sl.s || p.k), 1, 8)) AS BIGINT)
                     % {_CMS_W} AS b
            FROM probes p
            CROSS JOIN (SELECT unnest(['0:', '1:', '2:', '3:']) AS s) sl
        ), est AS (
            SELECT pb.k, MIN(COALESCE(m.c, 0)) AS estimate
            FROM pb LEFT JOIN merged m ON m.s = pb.s AND m.b = pb.b
            GROUP BY pb.k
        ), exact AS (
            SELECT CAST(o_custkey AS VARCHAR) AS k, COUNT(*) AS exact_cnt
            FROM orders WHERE o_custkey IN (1, 2, 5) GROUP BY 1
        )
        SELECT CAST(e.k AS BIGINT) AS probe_key,
               CAST(e.estimate AS BIGINT) AS estimate,
               CAST(COALESCE(x.exact_cnt, 0) AS BIGINT) AS exact_cnt
        FROM est e LEFT JOIN exact x ON e.k = x.k
    """,
    "agg_quantile_sketch_merge": """
        WITH seg AS (
            SELECT month(o_orderdate) AS m, o_totalprice,
                   md5(CAST(o_orderkey AS VARCHAR)) AS h
            FROM orders
        ), sk AS (
            SELECT m, o_totalprice, h FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY m ORDER BY h) AS rn
                FROM seg
            ) WHERE rn <= 256
        ), merged AS (
            SELECT * FROM sk ORDER BY h LIMIT 256
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY o_totalprice, h) AS r,
                   COUNT(*) OVER () AS nk
            FROM merged
        )
        SELECT COUNT(*) AS sample_k,
               COUNT(DISTINCT m) AS n_segments_sampled,
               MAX(CASE WHEN r = (50 * nk + 99) // 100 THEN o_totalprice END) AS p50,
               MAX(CASE WHEN r = (90 * nk + 99) // 100 THEN o_totalprice END) AS p90,
               MAX(CASE WHEN r = (99 * nk + 99) // 100 THEN o_totalprice END) AS p99
        FROM ranked
    """,
    "agg_mode": """
        WITH hc AS (
            SELECT event_type,
                   CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
                   COUNT(*) AS modal_count
            FROM events GROUP BY 1, 2
        ), ranked AS (
            SELECT event_type, hod, modal_count,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY modal_count DESC, hod ASC) AS rn,
                   SUM(modal_count) OVER (PARTITION BY event_type) AS n_total
            FROM hc
        )
        SELECT event_type, hod AS modal_hour, modal_count,
               CAST(modal_count AS DOUBLE) / CAST(n_total AS DOUBLE) AS modal_share
        FROM ranked WHERE rn = 1
    """,
    # the DECIMAL twin: DuckDB's decimal sums are exact like Spark's, and
    # every cast target is unambiguous (2-dp/4-dp values into 18,2/18,6 —
    # no representable halfway cases), so rounding-mode differences can't
    # bite; see agg_pricing_decimal docstring
    "agg_pricing_decimal": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_quantity <= 45
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity")} AS sum_qty,
               {sql_dsum("l_extendedprice")} AS sum_base_price,
               {sql_dsum(_SQL_DISC_PRICE, 6)} AS sum_disc_price,
               {sql_dsum(_SQL_CHARGE, 6)} AS sum_charge,
               {sql_davg("l_quantity")} AS avg_qty,
               {sql_davg("l_extendedprice")} AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_quantity <= 45
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_distinct_counts": """
        SELECT COUNT(DISTINCT o_custkey) AS n_custkeys,
               COUNT(DISTINCT o_orderstatus) AS n_statuses,
               COUNT(*) AS n_orders
        FROM orders
    """,
    # agg_approx_distinct: rows-only (approximation differs per engine)
    "agg_rollup_revenue": f"""
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS INT) AS g_region,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               {sql_dsum(_SQL_DISC_PRICE, 6)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "agg_cube_counts": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n,
               {sql_dsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_top_customers": f"""
        SELECT o_custkey, {sql_dsum("o_totalprice")} AS revenue
        FROM orders GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey ASC LIMIT 10
    """,
    "agg_string_concat": """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation GROUP BY n_regionkey
    """,
    "agg_conditional_sums": """
        SELECT l_linestatus,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE l_discount >= 0.05) AS DOUBLE) / 100.0
                 AS high_disc_price,
               COUNT(*) FILTER (WHERE l_returnflag = 'R' AND l_discount >= 0.05)
                 AS n_both
        FROM lineitem GROUP BY l_linestatus
    """,
    "agg_stats_moments": f"""
        WITH sums AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(x) AS sx, SUM(x * x) AS sxx,
                   SUM(y) AS sy, SUM(y * y) AS syy,
                   SUM(x * y) AS sxy
            FROM (
                SELECT l_returnflag,
                       CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS x,
                       CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS y
                FROM lineitem
            ) t
            GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               n AS n_rows,
               ROUND(SQRT({_SQL_VX}) / 100.0, 6) AS sd_qty,
               ROUND({_SQL_VX} / 10000.0, 6) AS var_qty,
               ROUND({_SQL_COV} / (SQRT({_SQL_VX}) * SQRT({_SQL_VY})), 6)
                 AS corr_qty_disc,
               ROUND({_SQL_COV} / 10000.0, 6) AS covar_qty_disc,
               ROUND({_SQL_COV} / {_SQL_VX}, 6) AS slope_disc_on_qty
        FROM sums
    """,
    "agg_percentiles": """
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
               ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    "agg_value_histogram": f"""
        SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               {sql_davg("value")} AS avg_value
        FROM events GROUP BY 1
    """,
    "agg_grouping_sets": f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n,
               {sql_dsum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
}
