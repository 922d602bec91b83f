"""JDBC ingestion exercised end-to-end (SURVEY §2.1 sources).

The reference's only real I/O path is JDBC/PostgreSQL
(``hello_cloud_run/pom.xml:28-32``; Cloud SQL wiring
``quarkus_cloud_run/src/main/resources/application.properties:10-12``).
Locally we stand in Apache Derby *embedded* — it ships inside Spark's own
jar directory (it backs the default Hive metastore), so the JDBC
DataSource path is exercised with zero extra dependencies and the exact
same ``spark.read.format("jdbc")`` plan a Postgres URL would produce.

Partitioned-read discipline (the 100 TB contract):

* Every scan passes ``partitionColumn/lowerBound/upperBound/numPartitions``
  — an unpartitioned JDBC read is ONE task pulling the whole table through
  one connection. Bounds come from a single min/max aggregate on the
  source (two scalars to the driver, never data-scaled).
* Bounds stripe ``seq`` uniformly; a skewed key would need a synthetic
  uniform column (e.g. ``mod(hash(pk), N)`` pushed as N predicates).
* Against a real server the read also sets ``fetchsize`` (row batching)
  and ``sessionInitStatement``; Derby embedded needs neither.
"""

from __future__ import annotations

import os


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._scratch import scratch_dir
from ..fixtures import MESSAGE_CHANGES_SQL, message_changes_df
from . import read_jdbc

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _roundtrip_via_derby(df: DataFrame, table: str, partition_column: str) -> DataFrame:
    """Write ``df`` to a fresh embedded-Derby database, read it back as a
    partitioned JDBC scan. A fresh database directory per call sidesteps
    Derby's one-JVM boot lock and makes the op idempotent."""
    spark = df.sparkSession
    db = os.path.join(scratch_dir("derby_"), "db")
    url = f"jdbc:derby:{db};create=true"
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", _DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    # Partition bounds: one map-side-combined min/max — two scalars back
    # to the driver regardless of table size. An empty source has NULL
    # bounds; any [lo, hi) works for zero rows — use [0, 1).
    lo, hi = df.agg(F.min(partition_column), F.max(partition_column)).first()
    if lo is None:
        lo, hi = 0, 1
    return read_jdbc(
        spark,
        url,
        table,
        partition_column=partition_column,
        num_partitions=8,
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        driver=_DERBY_DRIVER,
    )


def jdbc_message_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 materialization with the change log ingested over JDBC.

    The change log (bigint seq, op, id, nullable content, timestamp ts —
    every type the reference's ``message`` schema uses) goes Spark →
    Derby → Spark, then the standard LWW fold runs on the JDBC scan.
    Hash-matching the parquet-twin oracle proves the JDBC path is
    lossless, including NULLs and µs timestamps."""
    from ..operators.cdc import _fold

    changes = message_changes_df(spark, sf_dir)
    back = _roundtrip_via_derby(changes, "message_log", "seq")
    return _fold(back)


QUERIES = {"jdbc_message_roundtrip": jdbc_message_roundtrip}

ORACLES = {
    # Identical to cdc_materialize's oracle: the JDBC hop must be identity.
    "jdbc_message_roundtrip": f"""
        WITH message_changes AS ({MESSAGE_CHANGES_SQL}),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
            FROM message_changes
        )
        SELECT id, content, seq AS last_seq, ts AS updated_at
        FROM ranked WHERE rn = 1 AND op <> 'DELETE'
    """,
}
