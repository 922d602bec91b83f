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


def test_jdbc_roundtrip_partitioned(spark, sf_smoke):
    """JDBC ingestion contract (reference's native source,
    hello_cloud_run/pom.xml:28-32): Spark -> embedded Derby -> Spark is
    lossless for bigint/varchar/NULL/timestamp, and the read is a
    PARTITIONED scan (bounds-striped), never one task on one connection."""
    from cdc_cloudrun_demo_spark.fixtures import message_changes_df
    from cdc_cloudrun_demo_spark.sources.jdbc_io import _roundtrip_via_derby

    changes = message_changes_df(spark, sf_smoke)
    back = _roundtrip_via_derby(changes, "message_log", "seq")
    # partitioned-read discipline: the scan parallelizes
    assert back.rdd.getNumPartitions() > 1
    # name+type fidelity; nullability flags come from the DB catalog
    # (Derby marks every written column nullable), so they differ by design
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in changes.schema
    ]
    a = sorted(changes.collect())
    b = sorted(back.collect())
    assert a == b  # includes NULL content rows and µs timestamps


def test_schema_evolution_readers_agree(spark, sf_smoke):
    """Additive evolution contract (reference ddl-auto=update): the merged
    reader sees v1 rows unchanged (NULL for the added column), v2 rows
    carry it, and the materialized state exposes the evolved schema."""
    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.operators.schema_evolution import (
        _write_evolving_log,
        cdc_schema_evolution,
        read_evolved_log,
    )

    root = _write_evolving_log(spark, sf_smoke)
    merged = read_evolved_log(spark, root)
    assert "channel" in merged.columns
    v1 = spark.read.parquet(root + "/v1")  # pre-evolution reader, old schema
    assert "channel" not in v1.columns
    # pre/post readers agree on the shared columns of the v1 segment
    merged_v1 = merged.filter(F.col("channel").isNull()).select(*v1.columns)
    assert sorted(v1.collect()) == sorted(merged_v1.collect())
    state = cdc_schema_evolution(spark, sf_smoke)
    assert "channel" in state.columns
    rows = state.collect()
    assert any(r["channel"] is None for r in rows)  # key last touched pre-split
    assert any(r["channel"] is not None for r in rows)


def test_compact_parquet_small_files(spark, sf_smoke, tmp_path):
    """Compaction contract: a fragmented dataset collapses to the
    byte-targeted file count, values survive exactly, and a second pass
    is a no-op (idempotent maintenance loop)."""
    from cdc_cloudrun_demo_spark.catalog import load_table
    from cdc_cloudrun_demo_spark.sources import compact_parquet

    df = load_table(spark, sf_smoke, "events").select("event_id", "user_id")
    path = str(tmp_path / "fragmented")
    df.repartition(64).write.parquet(path)
    import glob

    n_before = len(glob.glob(path + "/*.parquet"))
    assert n_before >= 32
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(path + "/*.parquet")
    )
    n_after = compact_parquet(spark, path, target_file_bytes=total // 4 + 1)
    assert n_after <= 5, n_after
    back = spark.read.parquet(path)
    assert sorted(back.collect()) == sorted(df.collect())
    # fixpoint: a huge target collapses to one file, after which another
    # pass is a no-op (file untouched — mtime preserved)
    assert compact_parquet(spark, path, target_file_bytes=1 << 30) == 1
    import os

    (f,) = glob.glob(path + "/*.parquet")
    mtime = os.path.getmtime(f)
    assert compact_parquet(spark, path, target_file_bytes=1 << 30) == 1
    assert os.path.getmtime(f) == mtime
    assert sorted(spark.read.parquet(path).collect()) == sorted(df.collect())


def test_merge_schema_refuses_type_widening(spark, sf_smoke):
    """Documents WHY cdc_schema_widen uses explicit schema-on-read:
    parquet mergeSchema unions footers for ADDED columns but refuses a
    TYPE change on the same column (int vs bigint) — the widened read
    must be expressed as per-segment cast + union, which the operator
    does and its oracle verifies."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from cdc_cloudrun_demo_spark.operators.schema_evolution import (
        _write_widening_log,
    )

    root = _write_widening_log(spark, sf_smoke)
    with _pytest.raises(Exception) as exc:
        (
            spark.read.option("mergeSchema", "true")
            .parquet(f"{root}/v1", f"{root}/v2")
            .collect()
        )
    assert "merge" in str(exc.value).lower() or "incompatible" in str(exc.value).lower(), str(exc.value)[:300]


def test_sqldump_source_roundtrips_every_row_and_quote(spark, sf_smoke):
    """The custom Python DataSource's parse must be lossless: the
    read-back row count equals the source table's, and every synthesized
    note carries a real (un-escaped) quote — the '' escape rule worked
    in both directions. (File-parallel planning is visible in the scan:
    partitions() returns one InputPartition per dump file.)"""
    from cdc_cloudrun_demo_spark.sources.file_formats import (
        source_sqldump_roundtrip,
    )
    from cdc_cloudrun_demo_spark.catalog import load_table

    out = source_sqldump_roundtrip(spark, sf_smoke)
    rows = {r["o_orderstatus"]: r for r in out.collect()}
    n_orders = load_table(spark, sf_smoke, "orders").count()
    assert sum(r["n_orders"] for r in rows.values()) == n_orders
    for r in rows.values():
        assert r["n_quoted"] == r["n_orders"]  # every note has a real quote


def test_partitioned_roundtrip_prunes_directories(spark, sf_smoke, tmp_path):
    """The hive-partitioned read must resolve the lang filter as
    PARTITION pruning (directory-level, before any row is read): the
    scan node carries PartitionFilters on lang, and the scanned file
    set contains ONLY the two selected languages' directories."""
    import os

    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.catalog import load_table

    d = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_by_lang")
    d.write.partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang").isin("en", "de"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # DataFrame.inputFiles() lists the RELATION's files (pre-pruning);
    # the files actually opened at execution show the pruning
    files = [
        r[0]
        for r in back.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("lang=en" in f or "lang=de" in f for f in files)
    # the partition column itself round-trips from directory names
    langs = {r["lang"] for r in back.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}


def test_write_ordered_slices_incremental_groups_stay_ordered(
    spark, sf_smoke, tmp_path
):
    """Two slice groups written into ONE log dir must leave every later
    slice's pinned mtime strictly above every earlier slice's, even
    though the pins are set base+i seconds in the FUTURE (round-10
    advice: the base must fold in ALL slice_* files already under the
    log, or a second group written inside the pin window interleaves
    FileStreamSource delivery order)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.catalog import load_table
    from cdc_cloudrun_demo_spark.sources import write_ordered_slices

    d = load_table(spark, sf_smoke, "documents").select("doc_id")
    log = str(tmp_path / "log")
    write_ordered_slices(d, log, range(2), "doc_id", 4)
    write_ordered_slices(d, log, range(2, 4), "doc_id", 4)  # same window
    slice_max = {}
    for f in glob.glob(os.path.join(log, "slice_*", "*")):
        if os.path.isfile(f):
            s = os.path.basename(os.path.dirname(f))
            slice_max[s] = max(slice_max.get(s, 0), os.path.getmtime(f))
    names = sorted(slice_max)
    assert names == [f"slice_{i:03d}" for i in range(4)]
    pins = [slice_max[n] for n in names]
    assert pins == sorted(pins) and len(set(pins)) == 4, pins
