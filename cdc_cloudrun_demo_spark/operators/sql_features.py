"""Spark 4 SQL-surface features: recursive CTEs, EXECUTE IMMEDIATE,
SQL scripting, observed metrics, and XML round-trips.

The reference exposes exactly one SQL surface — JPA-generated DML plus
the `import.sql` seed script (`MessageRepository.java`,
`src/main/resources/import.sql`); everything else is bash-side. A
standalone analytics engine needs the modern declarative surfaces users
reach for daily: calendar/spine generation without a physical dimension
table (recursive CTE), parameterized SQL without string interpolation
(EXECUTE IMMEDIATE — the SQL-injection-safe twin of the reference's JPA
bind parameters), multi-statement procedural blocks (SQL scripting),
zero-extra-pass pipeline telemetry (`df.observe`), and XML as an
exchange format alongside the JSON the reference emits.

Scale notes per entry live on the functions; the common theme is that
each surface compiles down to ordinary Catalyst plans — the recursive
CTE is a bounded loop union (84 months, driver-side recursion control,
no data-size dependence), EXECUTE IMMEDIATE re-parses into the exact
plan of its inlined twin, scripting's loop runs K scalar aggregates
(each one exchange), observe piggybacks an AggregatingAccumulator on an
existing scan (zero extra jobs), and XML functions are JVM expressions
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def fn_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new SQL surface in Spark 4): generate a monthly
    calendar spine from the data's own min month to a fixed horizon,
    then left-join per-month order counts/revenue so silent months
    surface as zero rows — the classic use that otherwise needs a
    physical date dimension. The recursion is driver-controlled and
    bounded (≤ 84 iterations regardless of data size; recursion depth
    is calendar length, not row count), so the plan scales exactly like
    the underlying one-exchange aggregate; the spine side is a few
    dozen rows and broadcast. Anchor `MIN(o_orderdate)` makes the spine
    data-driven; the fixed end keeps the recursion bound static."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(mon) AS (
            SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
            FROM rc_orders
            UNION ALL
            SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM months
            WHERE mon < CAST('1998-08-01' AS DATE)
        ),
        per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
                   COUNT(*) AS n_orders,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS revenue_cents
            FROM rc_orders
            GROUP BY 1
        )
        SELECT CAST(m.mon AS TIMESTAMP) AS mon,
               COALESCE(p.n_orders, 0) AS n_orders,
               COALESCE(p.revenue_cents, 0) AS revenue_cents
        FROM months m LEFT JOIN per_month p ON m.mon = p.mon
        WHERE m.mon IS NOT NULL
        """
    )


FN_RECURSIVE_CTE_ORACLE = """
    WITH RECURSIVE months(mon) AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
        FROM orders
        UNION ALL
        SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE mon < CAST('1998-08-01' AS DATE)
    ),
    per_month AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               COUNT(*) AS n_orders,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS revenue_cents
        FROM orders
        GROUP BY 1
    )
    SELECT CAST(m.mon AS TIMESTAMP) AS mon,
           COALESCE(p.n_orders, 0) AS n_orders,
           CAST(COALESCE(p.revenue_cents, 0) AS BIGINT) AS revenue_cents
    FROM months m LEFT JOIN per_month p ON m.mon = p.mon
    WHERE m.mon IS NOT NULL
"""


def fn_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with positional bind parameters (Spark 4) —
    the SQL-level twin of the reference's JPA bind variables
    (`MessageRepository.java` derives parameterized queries; string
    interpolation is the injection-prone alternative both avoid). The
    statement text carries `?` placeholders; values bind at execution,
    so the SAME plan cache entry serves every parameter value. Compiles
    to the identical plan as the inlined query (the oracle)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("ei_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ei_orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT c.c_mktsegment,
                COUNT(*) AS n_orders,
                SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS revenue_cents
         FROM ei_customer c JOIN ei_orders o ON c.c_custkey = o.o_custkey
         WHERE c.c_nationkey = ? AND o.o_orderstatus = ?
         GROUP BY c.c_mktsegment'
        USING 5, 'F'
        """
    )


FN_EXECUTE_IMMEDIATE_ORACLE = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_nationkey = 5 AND o.o_orderstatus = 'F'
    GROUP BY c.c_mktsegment
"""


def fn_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN…END blocks): a DECLARE/WHILE loop
    sweeps five quantity thresholds and accumulates the cumulative
    matching-lineitem count — the procedural shape a DBA would write as
    a stored procedure. Each iteration is one scalar aggregate (one
    scan + one exchange); the loop bound is a constant 5, so the script
    costs exactly 5 bounded jobs at any data size. The oracle is the
    unrolled closed form (five scalar subqueries summed), proving the
    procedural and declarative forms agree."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("scr_lineitem")
    return spark.sql(
        """
        BEGIN
          DECLARE acc BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 5 DO
            SET acc = acc + (SELECT COUNT(*) FROM scr_lineitem
                             WHERE l_quantity <= i * 10);
            SET i = i + 1;
          END WHILE;
          SELECT 5 AS n_iters, acc AS cum_matching;
        END
        """
    )


FN_SQL_SCRIPTING_ORACLE = """
    SELECT 5 AS n_iters,
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 10)
              + (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 20)
              + (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 30)
              + (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 40)
              + (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 50)
              AS BIGINT) AS cum_matching
"""


def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.observe` (Observation API): pipeline telemetry collected on
    the SAME pass as the work, not a second scan — the generalization
    of the reference's request-counter metrics
    (`MetricsController.java` counts requests as a side effect of
    serving them). The observed metrics ride an AggregatingAccumulator
    on the scan task; the driver reads them after the action with ZERO
    extra jobs — at 100 TB this is the difference between free
    telemetry and doubling the read. The single result row is
    constant-size driver data (never a driver fetch of table rows); the
    oracle recomputes the same aggregates declaratively."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_shipdate"
    )
    obs = Observation("pipeline_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .alias("price_cents"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    row = Row(
        n_rows=m["n_rows"],
        price_cents=m["price_cents"],
        min_ship=m["min_ship"],
        max_ship=m["max_ship"],
    )
    return spark.createDataFrame(
        [row],
        "n_rows bigint, price_cents bigint, min_ship timestamp, max_ship timestamp",
    )


AGG_OBSERVE_ORACLE = """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
"""


def fn_xml_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as an exchange format: serialize per-document metadata with
    `to_xml(struct(...))`, parse it back with `from_xml`, and emit the
    round-tripped fields — the XML twin of the reference's JSON
    response bodies (`MessageResource.java` serializes entities to
    JSON; B8 extracts fields back out). Both directions are JVM
    catalyst expressions inside whole-stage codegen — no Python, no
    extra pass — so the op is scan-bound at any scale. The oracle
    selects the source fields directly: a hash match PROVES the
    round-trip is lossless (NULL fields are omitted on serialize and
    reappear as NULL on parse)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    xml = d.select(
        "doc_id",
        F.to_xml(F.struct("doc_id", "lang", "n_chars")).alias("x"),
    )
    parsed = xml.select(
        F.col("doc_id").alias("orig_id"),
        F.from_xml("x", "doc_id bigint, lang string, n_chars bigint").alias("p"),
    )
    return parsed.select(
        F.col("orig_id").alias("doc_id"),
        F.col("p.lang").alias("rt_lang"),
        F.col("p.n_chars").alias("rt_n_chars"),
    )


FN_XML_OPS_ORACLE = """
    SELECT doc_id, lang AS rt_lang, n_chars AS rt_n_chars
    FROM documents
"""


QUERIES = {
    "fn_recursive_cte": fn_recursive_cte,
    "fn_execute_immediate": fn_execute_immediate,
    "fn_sql_scripting": fn_sql_scripting,
    "agg_observe_metrics": agg_observe_metrics,
    "fn_xml_ops": fn_xml_ops,
}

ORACLES = {
    "fn_recursive_cte": FN_RECURSIVE_CTE_ORACLE,
    "fn_execute_immediate": FN_EXECUTE_IMMEDIATE_ORACLE,
    "fn_sql_scripting": FN_SQL_SCRIPTING_ORACLE,
    "agg_observe_metrics": AGG_OBSERVE_ORACLE,
    "fn_xml_ops": FN_XML_OPS_ORACLE,
}
