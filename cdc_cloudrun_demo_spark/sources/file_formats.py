"""Text-format ingestion exercised end-to-end: CSV and JSON-lines.

The reference persists through JDBC only, but any engine claiming its
workload must also ingest the flat-file formats data actually arrives in.
Both entries here round-trip a real table Spark → text format → Spark
with an EXPLICIT schema (the 100 TB discipline — ``inferSchema`` is an
extra full scan of the input, and a schema drifting under you mid-corpus
is how silent corruption ships), then aggregate the read-back rows.
Hash-matching an oracle that reads the pristine parquet proves the
text hop is lossless: NULLs, quoting, µs timestamps, float round-trip.

Scale notes baked into the plans:

* Reads pass the schema; writes/reads pin ``timestampFormat`` with
  microsecond precision (Spark's JSON/CSV default emits millis — a
  silent 1000× precision loss on event times).
* The aggregate uses the scaled-long sum discipline (operators/_util)
  so the value hash is engine-exact.
* The round-trip parallelism comes from the source files themselves
  (one file per input partition); a production ingest points the same
  reader at a directory of thousands of files and gets scan
  parallelism for free — nothing here collects rows to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._scratch import scratch_dir
from ..catalog import load_table
from ..operators._util import dsum, sql_dsum

_TS_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV (header, quoted strings, µs timestamps) → orders,
    then a per-status revenue summary over the read-back rows."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    o = load_table(spark, sf_dir, "orders").select(*cols)
    path = os.path.join(scratch_dir("csv_rt_"), "orders_csv")
    # nullValue pinned on BOTH sides: Spark's default maps an empty field
    # to NULL on read, so an empty-string cell would not round-trip —
    # the explicit sentinel keeps ''-vs-NULL distinct for any input
    (
        o.write.option("header", "true")
        .option("timestampFormat", _TS_US)
        .option("nullValue", "\\N")
        .mode("overwrite")
        .csv(path)
    )
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp"
    )
    back = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_US)
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_total"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines (µs timestamps, nullable value) → events,
    then a per-type activity summary over the read-back rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = os.path.join(scratch_dir("jsonl_rt_"), "events_jsonl")
    ev.write.option("timestampFormat", _TS_US).mode("overwrite").json(path)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )
    back = (
        spark.read.schema(schema).option("timestampFormat", _TS_US).json(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value", 6).alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem slice → ORC → aggregate, proving the columnar-format
    matrix beyond parquet. ORC round-trips types natively (no text
    parsing), so the interesting checks are predicate pushdown and
    column pruning on the read-back scan — the same PushedFilters
    discipline the parquet plans are tested for; the oracle proves
    value identity through the format hop."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    path = os.path.join(scratch_dir("orc_rt_"), "lineitem_orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).filter(F.col("l_quantity") < 25)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


def source_text_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured-text ingestion: events → access-log-style LINES →
    `spark.read.text` → regexp parse → aggregate. The write side
    renders each event as `user - - [epoch_us] "GET /<type>" 200
    <value_cents|->` (NULL metrics become `-`, the real access-log
    convention); the read side recovers every field with ONE
    `regexp_extract_all` pass per line — all JVM-side, whole-stage
    codegen, the pattern every raw-log ETL at 100 TB starts with (text
    splits by line, so a directory of log files scans fully parallel
    with no schema inference pass). The timestamp rides as integer
    epoch-µs: log-format timestamp STRINGS (locale month names, zone
    suffixes) are the classic silent-corruption seam, and the integer
    form makes the round-trip provably exact. Hash-match oracle
    aggregates the pristine parquet — losslessness of the text hop,
    NULL sentinel included, is the thing certified."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    line = F.concat(
        F.col("user_id").cast("string"),
        F.lit(" - - ["),
        F.unix_micros(F.col("ts")).cast("string"),
        F.lit('] "GET /'),
        F.col("event_type"),
        F.lit('" 200 '),
        F.coalesce(cents.cast("string"), F.lit("-")),
    )
    path = os.path.join(scratch_dir("textlog_"), "events_log")
    ev.select(line.alias("value")).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    pat = r'^(\d+) - - \[(\d+)\] "GET /([a-z_]+)" 200 (\d+|-)$'
    parsed = raw.select(
        F.regexp_extract("value", pat, 1).cast("long").alias("user_id"),
        F.timestamp_micros(
            F.regexp_extract("value", pat, 2).cast("long")
        ).alias("ts"),
        F.regexp_extract("value", pat, 3).alias("event_type"),
        F.nullif(F.regexp_extract("value", pat, 4), F.lit("-"))
        .cast("long")
        .alias("value_cents"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum("value_cents").alias("sum_cents"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


QUERIES = {
    "source_csv_roundtrip": source_csv_roundtrip,
    "source_jsonl_roundtrip": source_jsonl_roundtrip,
    "source_orc_roundtrip": source_orc_roundtrip,
    "source_text_log_parse": source_text_log_parse,
}

ORACLES = {
    # The oracles read the PRISTINE parquet: equality proves the text
    # hop (quote/escape/precision) is identity on every row.
    "source_csv_roundtrip": f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_dsum("o_totalprice")} AS sum_total,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_orderstatus
    """,
    "source_orc_roundtrip": f"""
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               {sql_dsum("l_extendedprice")} AS sum_price,
               MIN(l_shipdate) AS first_ship,
               MAX(l_shipdate) AS last_ship
        FROM lineitem
        WHERE l_quantity < 25
        GROUP BY l_returnflag
    """,
    "source_text_log_parse": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
               MAX(CAST(ts AS TIMESTAMP)) AS last_ts
        FROM events
        GROUP BY event_type
    """,
    "source_jsonl_roundtrip": f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               {sql_dsum("value", 6)} AS sum_value,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts
        FROM events
        GROUP BY event_type
    """,
}
