"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-shaped pricing summary,
SURVEY §7 Phase 0) on sf0.001. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_cloudrun_demo_spark.operators import registry
from cdc_cloudrun_demo_spark.operators.aggregates import agg_pricing_summary
from cdc_cloudrun_demo_spark.session import apply_runtime_confs

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the Spark
    code and the oracle SQL.
    """
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query.

    Missing keys (vs queries()) are the genuinely non-SQL-expressible /
    approximate ops — s9_metadata (catalog introspection),
    agg_approx_distinct (HLL), dedup_minhash_lsh / dedup_simhash
    (engine-specific hashes), sim_ann_lsh_topk / sim_ann_ivf_topk
    (approximate ANN) — which get the driver's rows-only check; their
    semantics are covered by dedicated tests instead (recall vs exact
    truth).
    """
    return dict(_ORACLES)
