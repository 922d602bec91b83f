"""Window functions (SURVEY §2.2; implicit in reference B2 drop-first and
S3/S4 key-gen/latest-per-key shapes).

All windows partition by a key — the shuffle is one exchange on the
partition key, then sort within partitions. At 100 TB the concern is key
skew (a user with millions of events); AQE skew handling covers joins but
not windows, so hot keys would need salted two-phase windows — not needed
for any operator here (all partitions are bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ._util import scaled_long


def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number, tie-break orderkey)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rnk").cast("long").alias("rnk"))
    )


def win_topn_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant top-3 per customer: identical result to
    ``win_topn_per_group`` via a salted two-phase plan.

    Phase 1 ranks within (key, salt) — a hot key's rows spread over
    ``n_salt`` tasks, each keeping only its local top-3. Phase 2 re-ranks
    the ≤ 3·n_salt survivors per key. The second shuffle carries only
    survivors, so a key with millions of rows costs O(rows/n_salt) per
    task instead of serializing one reducer — the salting pattern SURVEY
    §4 prescribes for window skew (AQE covers joins, not windows).

    Caveat (checked in the executed plan): Spark ≥3.5 already inserts
    WindowGroupLimit for rank/row_number ≤ k filters — a map-side top-k
    per input partition BEFORE the shuffle — which caps a hot key's
    reducer input at k·#map-partitions on its own. Manual salting remains
    the tool for window computations the optimizer can't group-limit:
    percent_rank/cume_dist, sliding aggregates, or rank filters hidden
    behind joins. Oracle: same SQL as win_topn_per_group (identical
    results)."""
    n_salt = 8
    o = load_table(spark, sf_dir, "orders")
    salted = o.withColumn(
        "_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salt))
    )
    w_local = Window.partitionBy("o_custkey", "_salt").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    survivors = (
        salted.withColumn("lrnk", F.row_number().over(w_local))
        .filter(F.col("lrnk") <= 3)
        .drop("_salt", "lrnk")
    )
    w_final = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(w_final))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order date (explicit ROWS frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled_long("o_totalprice", 2)).over(w) / F.lit(100.0)).alias("running_spend"),
    )


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, how many of their orders fall within
    ±1000.00 of each order's price (value-based frame bounds, not row
    counts — the frame spec §2.2 plans beyond ROWS BETWEEN)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_near_price"),
    )


def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sliding aggregate WITHOUT window explosion: for every
    event, the count and exact sum of the same user's events in the
    trailing hour, as a RANGE frame over integer microseconds. This is
    the per-event rolling feature a rate-limiter / fraud score needs —
    `window()` tumbling/sliding buckets can't express it (they align to
    the epoch grid, not to each row), and the explode-to-buckets
    alternative multiplies the table by the slide count. One shuffle on
    user_id; the frame scan is a two-pointer pass per partition. Ties in
    ts are value-peers, included symmetrically in both engines; the sum
    is scaled-long exact."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        (F.sum(scaled_long("value")).over(w).cast("double") / F.lit(100.0)).alias(
            "sum_value_1h"
        ),
    )


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event gaps (lag) and next event type (lead) — B9's
    event-time-delta generalized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


def win_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank of suppliers by balance within nation (raw-column
    ordering: doubles come straight from parquet, bit-identical in both
    engines, so ranks agree)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
    )


def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price quartiles over orders (deterministic via orderkey tie-break)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", F.ntile(4).over(w).cast("int").alias("price_quartile")
    )


def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order per customer (full-partition frame + distinct)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
        )
        .distinct()
    )


def win_sessionize(spark: SparkSession, sf_dir: str, gap_min: int = 30) -> DataFrame:
    """Sessionization as a window computation: a new session starts when
    the gap to the user's previous event exceeds 30 minutes; session_id =
    running count of session starts (lag + cumulative sum — two passes
    over ONE partitioning, so a single shuffle on user_id). Unlike
    `session_window` this keeps every event row with its session ordinal —
    the form feature pipelines join back to. Gap comparison is exact
    integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_min * 60 * 1_000_000), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new).over(wc).cast("long").alias("session_id"),
    )


def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive events
    with the same event_type (by event time). The island id is the
    classic difference of two row_numbers — global ordinal minus
    per-(user, type) ordinal is constant within a run — then one
    aggregate per island and an argmax per user. TWO window passes over
    the SAME (user_id)-keyed partitioning → one shuffle; the island
    aggregate reuses that partitioning (user_id is a prefix of the
    group key), and the final per-user argmax is max_by on ~runs-sized
    input. Deterministic tie-break: longest run, then earliest start."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_user = Window.partitionBy("user_id").orderBy(*order)
    w_type = Window.partitionBy("user_id", "event_type").orderBy(*order)
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_user) - F.row_number().over(w_type)).alias("island"),
    )
    runs = islands.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len"), F.min("ts").alias("run_start")
    )
    best = F.struct(
        F.col("run_len"),
        (-F.unix_micros(F.col("run_start"))).alias("neg_start"),
        F.col("event_type"),
    )
    return (
        runs.groupBy("user_id")
        .agg(F.max(best).alias("b"))
        .select(
            "user_id",
            F.col("b.event_type").alias("streak_type"),
            F.col("b.run_len").cast("long").alias("streak_len"),
        )
    )


def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution functions (percent_rank / cume_dist) over order
    price within status. Both are pure rank ratios — (rank-1)/(n-1) and
    peers/n — so the doubles are single exact divisions, identical in any
    engine; ties collapse to equal ranks deterministically."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").asc())
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_EWMA_TERMS = 31  # contributions beyond 2^-31 of the scale are exactly 0


def win_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA time-series smoothing with EXACT integer arithmetic — the
    float-free twist this repo applies to every 'inherently float'
    operator: with α = 1/2 every coefficient (1/2)^(j+1) is a power of
    two, so the smoothed value at scale 2^31 is Σ_j X_{i-j}·2^(30-j) —
    pure integer shifts and adds, bit-identical in any engine, where
    the textbook recursive float EWMA accumulates in partition order
    and never cross-checks. The operator is DEFINED as the 31-term
    dyadic filter (a finite impulse response with coefficients
    2^-1 … 2^-31) rather than the infinite recursion: the dropped tail
    is bounded by 2^-31 of the signal's running magnitude — below one
    scaled unit for this column's range — and making the cut explicit
    is what keeps every emitted value exact instead of
    approximately-converged. One key-partitioned window pass (31 LAG
    reads share one sort); output is the scaled long plus its double
    read-off (one exact division by 2^31)."""
    ev = load_table(spark, sf_dir, "events")
    x = scaled_long(F.col("value"), 2)  # exact cents-scale input
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    smoothed = sum(
        (
            F.coalesce(F.lag(x, j).over(w), F.lit(0)) * F.lit(1 << (30 - j))
            for j in range(1, _EWMA_TERMS)
        ),
        x * F.lit(1 << 30),
    )
    return ev.select(
        "user_id",
        "event_id",
        smoothed.cast("long").alias("ewma_scaled"),
        (smoothed.cast("double") / F.lit(float(1 << 31))).alias("ewma"),
    )


_Z_THRESH = 2  # |z| > 2 flags an outlier
_Z_MIN_N = 3


def win_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend-anomaly detection: orders whose total price
    sits more than _Z_THRESH sample standard deviations from that
    customer's mean — the windowed z-score gate every monitoring /
    fraud / data-quality pipeline runs. Float z-scores are the classic
    cross-engine trap (sqrt + order-dependent float sums); here the
    predicate |z| > t is cleared of ALL floats by cross-multiplication:

        z² > t²  ⟺  (n·x − S)² · (n−1)  >  t² · n · (n·SS − S²)

    with S = Σx, SS = Σx² over the customer's orders in exact
    whole-dollar integers — both sides are order-insensitive integer
    sums, so the flag is bit-identical in any engine at any
    parallelism. int64 headroom: dollars ≤ 10⁶ and per-key n ≤ ~10³
    keep (n·x−S)²·(n−1) under ~10¹⁸; past that the decimal path
    documented in _util applies.

    Plan: window aggregates (count/sum/sum-of-squares) over the
    customer partition — ONE shuffle on o_custkey, no join back; the
    filter then keeps only flagged rows, so the output is anomaly-sized
    not data-sized."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    amt = scaled_long("o_totalprice", 0)
    enriched = o.select(
        "o_custkey",
        "o_orderkey",
        amt.alias("amt_usd"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(amt).over(w).alias("s"),
        F.sum(amt * amt).over(w).alias("ss"),
    )
    dev = F.col("n") * F.col("amt_usd") - F.col("s")
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        enriched.filter(F.col("n") >= _Z_MIN_N)
        .filter(
            dev * dev * (F.col("n") - 1)
            > F.lit(_Z_THRESH * _Z_THRESH) * F.col("n") * var_num
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "amt_usd",
            F.col("n").alias("n_orders"),
            dev.alias("dev_n_scaled"),
        )
    )


ZSCORE_ORACLE = f"""
    WITH enriched AS (
        SELECT o_custkey, o_orderkey,
               CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS amt_usd,
               COUNT(*) OVER w AS n,
               SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) OVER w AS s,
               SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)
                   * CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) OVER w AS ss
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey)
    )
    SELECT o_custkey, o_orderkey, amt_usd,
           CAST(n AS BIGINT) AS n_orders,
           CAST(n * amt_usd - s AS BIGINT) AS dev_n_scaled
    FROM enriched
    WHERE n >= {_Z_MIN_N}
      AND (n * amt_usd - s) * (n * amt_usd - s) * (n - 1)
          > {_Z_THRESH * _Z_THRESH} * n * (n * ss - s * s)
"""


_RISE_MIN_RUN = 3


def win_match_rising(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching (MATCH_RECOGNIZE / CEP-lite): per
    customer, the maximal runs of ≥ 3 consecutive orders with strictly
    increasing total price — the "A B+ C" row-pattern class SQL:2016
    added and Flink CEP executes, expressed with the two-window
    identity: (1) lag() marks each row as continuing or breaking the
    rise, (2) a running sum of breaks is the run id (gaps-and-islands),
    (3) per-run aggregates filter to runs ≥ the minimum length.
    Ordering ties are broken by o_orderkey so the sequence — and hence
    every run — is a total order both engines reproduce; prices compare
    as exact cents.

    Plan: both windows partition by o_custkey — ONE shuffle total
    (Catalyst folds same-partitioning windows into one exchange), and
    the per-run aggregate reuses the same key. Nothing global, nothing
    data-sized in the output."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    amt = scaled_long("o_totalprice", 2)
    marked = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        amt.alias("amt_cents"),
        F.when(F.lag(amt).over(w).isNull(), 1)
        .when(F.lag(amt).over(w) >= amt, 1)
        .otherwise(0)
        .alias("brk"),
    )
    runs = marked.withColumn(
        "run_id",
        F.sum("brk").over(
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy("o_custkey", "run_id")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("o_orderdate").alias("start_date"),
            F.max("o_orderdate").alias("end_date"),
            F.min("amt_cents").alias("first_cents"),
            F.max("amt_cents").alias("last_cents"),
        )
        .filter(F.col("run_len") >= _RISE_MIN_RUN)
        .select(
            "o_custkey",
            "run_len",
            "start_date",
            "end_date",
            "first_cents",
            "last_cents",
        )
    )


MATCH_RISING_ORACLE = f"""
    WITH marked AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS amt_cents,
               CASE WHEN LAG(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                         OVER w IS NULL THEN 1
                    WHEN LAG(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                         OVER w >= CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                         THEN 1
                    ELSE 0 END AS brk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), runs AS (
        SELECT *, SUM(brk) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS run_id
        FROM marked
    )
    SELECT o_custkey, COUNT(*) AS run_len,
           MIN(o_orderdate) AS start_date, MAX(o_orderdate) AS end_date,
           MIN(amt_cents) AS first_cents, MAX(amt_cents) AS last_cents
    FROM runs GROUP BY o_custkey, run_id
    HAVING COUNT(*) >= {_RISE_MIN_RUN}
"""


QUERIES = {
    "win_match_rising": win_match_rising,
    "win_zscore_outliers": win_zscore_outliers,
    "win_ewma_dyadic": win_ewma_dyadic,
    "win_streaks": win_streaks,
    "win_sessionize": win_sessionize,
    "win_distribution": win_distribution,
    "win_topn_per_group": win_topn_per_group,
    "win_topn_salted": win_topn_salted,
    "win_range_frame": win_range_frame,
    "win_time_range_frame": win_time_range_frame,
    "win_running_total": win_running_total,
    "win_lag_lead": win_lag_lead,
    "win_rank_in_group": win_rank_in_group,
    "win_ntile": win_ntile,
    "win_first_last": win_first_last,
}

_TOPN_SQL = """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
            FROM orders
        ) t WHERE rnk <= 3
    """

_EWMA_TERMS_SQL = " + ".join(
    ["x * {}".format(1 << 30)]
    + [
        f"COALESCE(LAG(x, {j}) OVER w, 0) * {1 << (30 - j)}"
        for j in range(1, _EWMA_TERMS)
    ]
)

ORACLES = {
    "win_match_rising": MATCH_RISING_ORACLE,
    "win_zscore_outliers": ZSCORE_ORACLE,
    "win_ewma_dyadic": f"""
        WITH base AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
            FROM events
        ), sm AS (
            SELECT user_id, event_id,
                   CAST({_EWMA_TERMS_SQL} AS BIGINT) AS ewma_scaled
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
        )
        SELECT user_id, event_id, ewma_scaled,
               CAST(ewma_scaled AS DOUBLE) / 2147483648.0 AS ewma
        FROM sm
    """,
    "win_streaks": """
        WITH islands AS (
            SELECT user_id, event_type, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id)
                 - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS island
            FROM events
        ), runs AS (
            SELECT user_id, event_type, island,
                   COUNT(*) AS run_len, MIN(ts) AS run_start
            FROM islands GROUP BY user_id, event_type, island
        ), ranked AS (
            SELECT user_id, event_type, run_len,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY run_len DESC, run_start ASC,
                                event_type DESC) AS rn
            FROM runs
        )
        SELECT user_id,
               event_type AS streak_type,
               CAST(run_len AS BIGINT) AS streak_len
        FROM ranked WHERE rn = 1
    """,
    "win_time_range_frame": """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_trailing_1h,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                    AS DOUBLE) / 100.0 AS sum_value_1h
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
        )
    """,
    "win_sessionize": """
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN prev_us IS NULL
                             OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us
                                > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM (
                SELECT user_id, event_id, ts,
                       LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                       ) AS prev_us
                FROM events
            ) g
        ) s
    """,
    "win_distribution": """
        SELECT o_orderkey, o_orderstatus,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC)
    """,
    "win_topn_per_group": _TOPN_SQL,
    # the salted two-phase plan must produce the exact same rows
    "win_topn_salted": _TOPN_SQL,
    "win_range_frame": """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
                 AS n_near_price
        FROM orders
    """,
    "win_running_total": """
        SELECT o_custkey, o_orderkey,
               (CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100.0) AS running_spend
        FROM orders
    """,
    "win_lag_lead": """
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
               LEAD(event_type) OVER w AS next_event_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    "win_rank_in_group": """
        SELECT s_nationkey, s_suppkey, s_acctbal,
               CAST(RANK() OVER w AS BIGINT) AS bal_rank,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
    """,
    "win_ntile": """
        SELECT o_orderkey,
               CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
                 AS price_quartile
        FROM orders
    """,
    "win_first_last": """
        SELECT DISTINCT o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER w AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
}
