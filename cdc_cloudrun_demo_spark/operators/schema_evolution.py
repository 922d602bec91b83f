"""Schema evolution over the CDC change log (SURVEY §1.2).

The reference auto-migrates its relational schema on deploy
(``hello_cloud_run/src/main/resources/application-cloud-sql.properties:23``
``spring.jpa.hibernate.ddl-auto=update`` — additive DDL only). The
columnar-log analog: a producer starts emitting change events with an
extra nullable column mid-stream; old log segments keep the v1 schema,
new segments carry v2, and every reader — batch fold, snapshot, time
travel — must see one unioned schema without rewriting history.

Spark-first mechanics: the two schema generations live as separate
parquet segment directories under one log root; ``mergeSchema=true`` on
the read unions the footers (v1 rows get NULL for the added column —
exactly Hibernate's ``ADD COLUMN`` semantics, no table rewrite). At
100 TB this is the only viable migration: evolution costs one footer
merge at planning time, zero data I/O. The fold then carries the evolved
column through LWW, so keys last touched before the migration surface
NULL and keys touched after carry the producer's value.

Deterministic fixture: the split point is the fixed literal
``2024-01-30`` — late enough in the event range that some keys' LAST
write predates it (their state rows surface NULL channel) while most
post-date it, at every test SF — and v2's added column ``channel``
derives from the event key; both are reproducible in the DuckDB oracle
without reading our parquet.
"""

from __future__ import annotations

import os


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .._scratch import scratch_dir
from ..fixtures import MESSAGE_CHANGES_SQL, message_changes_df

_SPLIT = "2024-01-30"
# v2's new column: producer-assigned delivery channel, derived from the
# key so the oracle can recompute it. Mirrored in _CHANNEL_SQL. (Built
# lazily — Column construction needs an active SparkContext.)
def _channel_col():
    return (
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "mobile")
        .otherwise("api")
    )


_CHANNEL_SQL = (
    "CASE WHEN id % 3 = 0 THEN 'web' WHEN id % 3 = 1 THEN 'mobile' ELSE 'api' END"
)


def _write_evolving_log(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the two-generation log: segment dirs v1/ (5 columns)
    and v2/ (6 columns, added nullable ``channel``) under one root."""
    root = scratch_dir("cdc_log_")
    changes = message_changes_df(spark, sf_dir)
    cut = F.col("ts") < F.lit(_SPLIT).cast("timestamp")
    changes.filter(cut).write.mode("overwrite").parquet(os.path.join(root, "v1"))
    (
        changes.filter(~cut)
        .withColumn("channel", _channel_col())
        .write.mode("overwrite")
        .parquet(os.path.join(root, "v2"))
    )
    return root


def read_evolved_log(spark: SparkSession, root: str) -> DataFrame:
    """One logical table over both schema generations. ``mergeSchema``
    unions parquet footers at planning time; v1 rows yield NULL for
    ``channel``. (Default readers take the schema of one footer — the
    option is the explicit evolution contract, as the test asserts.)"""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(root, "v1"), os.path.join(root, "v2"))
    )


def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW materialization across the schema break: the evolved state
    carries ``channel``, NULL for keys last written pre-migration."""
    log = read_evolved_log(spark, _write_evolving_log(spark, sf_dir))
    w = Window.partitionBy("id").orderBy(F.desc("seq"))
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select(
            "id",
            "content",
            "channel",
            F.col("seq").alias("last_seq"),
            F.col("ts").alias("updated_at"),
        )
    )


QUERIES = {"cdc_schema_evolution": cdc_schema_evolution}

ORACLES = {
    "cdc_schema_evolution": f"""
        WITH message_changes AS ({MESSAGE_CHANGES_SQL}),
        unioned AS (
            SELECT seq, op, id, content, ts, CAST(NULL AS VARCHAR) AS channel
            FROM message_changes WHERE ts < TIMESTAMP '{_SPLIT}'
            UNION ALL
            SELECT seq, op, id, content, ts, {_CHANNEL_SQL} AS channel
            FROM message_changes WHERE ts >= TIMESTAMP '{_SPLIT}'
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
            FROM unioned
        )
        SELECT id, content, channel, seq AS last_seq, ts AS updated_at
        FROM ranked WHERE rn = 1 AND op <> 'DELETE'
    """,
}
