"""Data-quality constraint suite — Deequ-style declarative checks.

The reference's only validity probe is the actuator health endpoint and
the row-count sanity check (SURVEY §2.1 S8, `MetricsController.java:61`
guarding `count == 0`); a 100 TB ingest pipeline needs the table-level
generalization: a suite of declared constraints (completeness,
uniqueness, referential integrity, ranges, domain membership) evaluated
in one pass per table and reported as one row per constraint — the
gate a curation job runs before publishing a snapshot.

Scale shape: every check is a map-side-combined aggregate over one scan
of its table (conditional sums — no per-check scan); the FK check is the
one join, keyed on the FK column (shuffle join at scale; the dimension
side here is broadcast-eligible and AQE picks that locally). The output
is |constraints| rows regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_ALLOWED_LANGS = ("en", "es", "fr", "de", "zh")


def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per constraint: (constraint, tbl, n_checked, n_violations,
    passed). Single-scan conditional aggregates per table; the orders→
    customer referential check counts FK values with no matching PK via
    a left join + null test (null-safe: a NULL FK is counted by the
    completeness check, not the FK check)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    documents = load_table(spark, sf_dir, "documents")

    # orders: totalprice range + FK integrity share one scan each
    orders_range = orders.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
    )
    fk = (
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_checked")))
    )
    pk = lineitem.agg(
        F.count(F.lit(1)).alias("n_checked"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("n_violations"),
    )
    nn = customer.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
    )
    qty = lineitem.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    )
    # cross-table temporal consistency: a line can't ship before its
    # order was placed — the one constraint that NEEDS a join (keyed on
    # the FK, the partitioning both tables already carry at scale)
    dates = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    langs = documents.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(
            F.when(~F.col("lang").isin(*_ALLOWED_LANGS), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    )

    def tag(df: DataFrame, name: str, tbl: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("constraint"),
            F.lit(tbl).alias("tbl"),
            F.col("n_checked").cast("long").alias("n_checked"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )

    return (
        tag(orders_range, "range_totalprice_positive", "orders")
        .unionAll(tag(fk, "fk_orders_custkey_in_customer", "orders"))
        .unionAll(tag(pk, "pk_lineitem_orderkey_linenumber_unique", "lineitem"))
        .unionAll(tag(nn, "not_null_c_acctbal", "customer"))
        .unionAll(tag(qty, "range_quantity_1_50", "lineitem"))
        .unionAll(tag(dates, "ship_not_before_order_date", "lineitem"))
        .unionAll(tag(langs, "lang_in_allowed_set", "documents"))
    )


_LOG2_MAX = 40


def _floor_log2_sql(expr: str) -> str:
    """floor(log2(x)) for x ≥ 1 as a pure-integer CASE sum — portable
    across engines (no float log whose last ulp could flip a bucket at
    an exact power of two) and constant-folded into one codegen stage."""
    return "(" + " + ".join(
        f"(CASE WHEN {expr} >= {1 << i} THEN 1 ELSE 0 END)"
        for i in range(1, _LOG2_MAX + 1)
    ) + ")"


def dq_skew_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile: the log₂ histogram of per-key row counts
    for lineitem.l_suppkey — the diagnostic that decides salting /
    AQE-skew-join settings BEFORE a 100 TB shuffle, the distributed
    analog of the reference's health probe (it guards `count == 0`;
    a cluster engine must also guard `count(hottest key) ≫ median`).
    One key-count aggregate (map-side combined), then a histogram over
    the |keys|-row count table — output is ≤ 40 rows regardless of data
    size. The bucket is an exact integer floor-log₂ (unrolled CASE sum,
    no float log), so a key count sitting exactly on a power of two
    cannot land in different buckets across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_key.groupBy(
            F.expr(_floor_log2_sql("cnt")).cast("long").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.min("cnt").alias("min_rows"),
            F.max("cnt").alias("max_rows"),
        )
    )


SKEW_ORACLE = f"""
    WITH per_key AS (
        SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST({_floor_log2_sql('cnt')} AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           MIN(cnt) AS min_rows,
           MAX(cnt) AS max_rows
    FROM per_key GROUP BY 1
"""


def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness: for every event_type, its row count, newest
    event time, staleness (µs behind the newest event anywhere — exact
    integer epoch arithmetic, no float time), and how much of its volume
    arrived in the global trailing day — the ingest-monitoring gate that
    pages before a silent upstream stall poisons a snapshot (the
    time-dimension sibling of the reference's `count == 0` health probe).
    One map-side-combined aggregate per type plus a 1-row broadcast of
    the global max; output is |event types| rows at any scale."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("max_ts"),
        F.max(F.unix_micros("ts")).alias("max_us"),
    )
    glob = per_type.agg(F.max("max_us").alias("global_max_us"))
    recent = ev.crossJoin(F.broadcast(glob.select(F.col("global_max_us").alias("g")))).filter(
        F.unix_micros("ts") > F.col("g") - F.lit(86_400_000_000)
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n_last_day"))
    return (
        per_type.crossJoin(F.broadcast(glob))
        .join(recent, "event_type", "left_outer")
        .select(
            "event_type",
            "n_events",
            "max_ts",
            (F.col("global_max_us") - F.col("max_us")).alias("staleness_us"),
            F.coalesce("n_last_day", F.lit(0)).alias("n_last_day"),
        )
    )


def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the documents table — (column, n_rows,
    n_null, n_distinct) per column, the Deequ/Glue-crawler completeness
    + cardinality profile a curation job publishes with every snapshot.
    ONE scan computes every column's counters as conditional aggregates;
    the per-column rows come from unpivoting the 1-row aggregate with
    ``stack`` (a 5-row expansion of one row — no second scan, no
    per-column job). exact distincts, not approximations, so the oracle
    matches bit for bit."""
    d = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"null_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    one = d.agg(*aggs)
    stack = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_null, n_distinct)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_null", "n_distinct")


def dq_drift_psi(spark: SparkSession, sf_dir: str, n_bins: int = 10) -> DataFrame:
    """Population Stability Index — the standard drift gate between a
    reference and a current data segment (here: even vs odd event_id
    halves of the events table, the engine's stand-in for last-month vs
    this-month ingest). A training pipeline runs this before trusting a
    new snapshot: PSI < 0.1 stable, 0.1–0.25 moderate drift, > 0.25
    investigate.

    Shape: ONE scan of the table; the reference segment's (min, max) is
    a 1-row bounds aggregate broadcast back (the zone-map pattern),
    every row clamps into one of ``n_bins`` equal-width bins, and one
    groupBy(bin) produces both segments' counts via conditional sums.
    The bin spine explodes from the bounds row, so empty bins still
    report (their smoothed term is part of PSI). Laplace (+1)
    smoothing keeps the log finite.

    Portability: bin edges and the smoothed proportions are pure IEEE
    double chains over exact integers (identical in both engines); the
    one transcendental — ln of the proportion ratio — uses the
    round-at-3-then-floor micro-nat discipline of the LM scorers
    (functions/text.py), so the last-ulp libm divergence cannot flip
    the hash. Output: (bin, n_ref, n_cur, dlog_micro, psi_term_micro).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    seg = ev.select((F.col("event_id") % 2 == 0).alias("is_ref"), "value")
    bounds = seg.filter(F.col("is_ref")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / n_bins
    raw = F.floor((F.col("value") - F.col("lo")) / width)
    bin_ = (
        F.when(F.col("hi") <= F.col("lo"), F.lit(0))
        .otherwise(F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)))
        .cast("int")
    )
    counts = (
        seg.crossJoin(F.broadcast(bounds))
        .select("is_ref", bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
            .cast("long")
            .alias("n_cur"),
        )
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    full = (
        spine.join(counts, "bin", "left_outer")
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
        .crossJoin(
            F.broadcast(
                counts.agg(
                    F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
                )
            )
        )
    )
    p_ref = (F.col("n_ref") + 1).cast("double") / (
        (F.col("tot_ref") + n_bins).cast("double")
    )
    p_cur = (F.col("n_cur") + 1).cast("double") / (
        (F.col("tot_cur") + n_bins).cast("double")
    )
    ratio = ((F.col("n_cur") + 1) * (F.col("tot_ref") + n_bins)).cast("double") / (
        ((F.col("n_ref") + 1) * (F.col("tot_cur") + n_bins)).cast("double")
    )
    dlog_micro = F.floor(F.round(F.log(ratio) * F.lit(1_000_000.0), 3)).cast("long")
    return full.select(
        "bin",
        "n_ref",
        "n_cur",
        dlog_micro.alias("dlog_micro"),
        F.round((p_cur - p_ref) * dlog_micro.cast("double"), 3).alias(
            "psi_term_micro"
        ),
    )


QUERIES = {
    "dq_constraints": dq_constraints,
    "dq_drift_psi": dq_drift_psi,
    "dq_skew_histogram": dq_skew_histogram,
    "dq_freshness_lag": dq_freshness_lag,
    "dq_null_profile": dq_null_profile,
}

_LANG_LIST = ", ".join(f"'{x}'" for x in _ALLOWED_LANGS)

ORACLES = {
    "dq_skew_histogram": SKEW_ORACLE,
    "dq_drift_psi": """
        WITH seg AS (
            SELECT (event_id % 2 = 0) AS is_ref, value
            FROM events WHERE value IS NOT NULL
        ), bounds AS (
            SELECT MIN(value) AS lo, MAX(value) AS hi FROM seg WHERE is_ref
        ), binned AS (
            SELECT is_ref,
                   CASE WHEN hi <= lo THEN 0
                        ELSE CAST(LEAST(9, GREATEST(0,
                            FLOOR((value - lo) / ((hi - lo) / 10)))) AS INT)
                   END AS bin
            FROM seg, bounds
        ), counts AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_ref,
                   CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_cur
            FROM binned GROUP BY bin
        ), tot AS (
            SELECT SUM(n_ref) AS tot_ref, SUM(n_cur) AS tot_cur FROM counts
        ), spine AS (
            SELECT CAST(UNNEST(RANGE(0, 10)) AS INT) AS bin FROM bounds
        ), filled AS (
            SELECT s.bin, COALESCE(c.n_ref, 0) AS n_ref,
                   COALESCE(c.n_cur, 0) AS n_cur, t.tot_ref, t.tot_cur
            FROM spine s LEFT JOIN counts c USING (bin) CROSS JOIN tot t
        ), terms AS (
            SELECT bin, n_ref, n_cur,
                   CAST(n_cur + 1 AS DOUBLE) / CAST(tot_cur + 10 AS DOUBLE)
                     - CAST(n_ref + 1 AS DOUBLE) / CAST(tot_ref + 10 AS DOUBLE)
                     AS dp,
                   CAST(FLOOR(ROUND(LN(
                       CAST((n_cur + 1) * (tot_ref + 10) AS DOUBLE)
                     / CAST((n_ref + 1) * (tot_cur + 10) AS DOUBLE)
                   ) * 1000000.0, 3)) AS BIGINT) AS dlog_micro
            FROM filled
        )
        SELECT bin, n_ref, n_cur, dlog_micro,
               ROUND(dp * CAST(dlog_micro AS DOUBLE), 3) AS psi_term_micro
        FROM terms
    """,
    "dq_freshness_lag": """
        WITH ev AS (
            SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ), per_type AS (
            SELECT event_type, COUNT(*) AS n_events,
                   MAX(ts) AS max_ts, MAX(us) AS max_us
            FROM ev GROUP BY event_type
        ), gmax AS (SELECT MAX(max_us) AS global_max_us FROM per_type),
        recent AS (
            SELECT event_type, COUNT(*) AS n_last_day
            FROM ev, gmax WHERE us > global_max_us - 86400000000
            GROUP BY event_type
        )
        SELECT p.event_type, p.n_events, p.max_ts,
               CAST(g.global_max_us - p.max_us AS BIGINT) AS staleness_us,
               COALESCE(r.n_last_day, 0) AS n_last_day
        FROM per_type p CROSS JOIN gmax g
        LEFT JOIN recent r ON p.event_type = r.event_type
    """,
    "dq_null_profile": """
        WITH cols(column_name) AS (
            VALUES ('doc_id'), ('text'), ('lang'), ('source'), ('n_chars')
        )
        SELECT c.column_name,
               (SELECT COUNT(*) FROM documents) AS n_rows,
               CASE c.column_name
                   WHEN 'doc_id' THEN (SELECT CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
                   WHEN 'text' THEN (SELECT CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
                   WHEN 'lang' THEN (SELECT CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
                   WHEN 'source' THEN (SELECT CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
                   ELSE (SELECT CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
               END AS n_null,
               CASE c.column_name
                   WHEN 'doc_id' THEN (SELECT COUNT(DISTINCT doc_id) FROM documents)
                   WHEN 'text' THEN (SELECT COUNT(DISTINCT text) FROM documents)
                   WHEN 'lang' THEN (SELECT COUNT(DISTINCT lang) FROM documents)
                   WHEN 'source' THEN (SELECT COUNT(DISTINCT source) FROM documents)
                   ELSE (SELECT COUNT(DISTINCT n_chars) FROM documents)
               END AS n_distinct
        FROM cols c
    """,
    "dq_constraints": f"""
        SELECT 'range_totalprice_positive' AS constraint, 'orders' AS tbl,
               COUNT(*) AS n_checked,
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violations,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'fk_orders_custkey_in_customer', 'orders',
               (SELECT COUNT(*) FROM orders),
               CAST(COUNT(*) AS BIGINT),
               COUNT(*) = 0
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'pk_lineitem_orderkey_linenumber_unique', 'lineitem',
               COUNT(*),
               CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
               COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) = 0
        FROM lineitem
        UNION ALL
        SELECT 'not_null_c_acctbal', 'customer',
               COUNT(*),
               CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) = 0
        FROM customer
        UNION ALL
        SELECT 'range_quantity_1_50', 'lineitem',
               COUNT(*),
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'ship_not_before_order_date', 'lineitem',
               COUNT(*),
               CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                             THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) = 0
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lang_in_allowed_set', 'documents',
               COUNT(*),
               CAST(SUM(CASE WHEN lang NOT IN ({_LANG_LIST}) THEN 1 ELSE 0 END)
                    AS BIGINT),
               SUM(CASE WHEN lang NOT IN ({_LANG_LIST}) THEN 1 ELSE 0 END) = 0
        FROM documents
    """,
}
