"""Source/sink roundtrips and the partitioned-layout pruning contract
(SURVEY §2.1 "Scans/sources/sinks")."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_cloudrun_demo_spark.catalog import load_table
from cdc_cloudrun_demo_spark.plans import formatted_plan
from cdc_cloudrun_demo_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
)


def _nations(spark, sf):
    return load_table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def test_parquet_roundtrip(spark, sf_smoke, tmp_path):
    df = _nations(spark, sf_smoke)
    path = str(tmp_path / "nations_pq")
    write_parquet(df, path)
    back = read_parquet(spark, path)
    assert sorted(back.collect()) == sorted(df.collect())


def test_partitioned_parquet_prunes_directories(spark, sf_smoke, tmp_path):
    """A filter on the partition key must become partition pruning, not a
    full scan — the 100 TB layout lever."""
    df = _nations(spark, sf_smoke)
    path = str(tmp_path / "nations_part")
    write_parquet(df, path, partition_by=["n_regionkey"])
    back = read_parquet(spark, path).filter(F.col("n_regionkey") == 2)
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "n_regionkey" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0], plan
    assert back.count() == df.filter(F.col("n_regionkey") == 2).count()


def test_csv_roundtrip_with_explicit_schema(spark, sf_smoke, tmp_path):
    df = _nations(spark, sf_smoke)
    path = str(tmp_path / "nations_csv")
    write_csv(df, path)
    back = read_csv(
        spark, path, "n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_json_roundtrip_with_explicit_schema(spark, sf_smoke, tmp_path):
    """JSON-lines is the reference's only output format (Jackson over
    HTTP); roundtrip with declared schema (inference is a full extra pass)."""
    df = _nations(spark, sf_smoke)
    path = str(tmp_path / "nations_json")
    write_json(df, path)
    back = read_json(
        spark, path, "n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    """ORC as an alternate columnar source: write/read round-trip preserves
    schema and values (ORC ships in Spark's distribution; at scale it's
    interchangeable with parquet for the engine's batch surface)."""
    from cdc_cloudrun_demo_spark.catalog import load_table

    n = load_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_orc")
    n.write.format("orc").save(path)
    back = spark.read.format("orc").load(path)
    assert back.schema == n.schema
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in n.collect()
    )
