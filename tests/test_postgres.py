"""Real-PostgreSQL integration (sources/postgres_io.py): the
reference's actual database engine (terraform/database.tf POSTGRES_15)
run locally, with COPY-text transport fidelity pinned on the cases
that silently corrupt naive CSV pipes — NULL vs empty string, tabs /
newlines / backslashes inside values, unicode — and the dialect
behaviors the CRUD statements rely on."""

from __future__ import annotations

import pytest

from cdc_cloudrun_demo_spark.sources.postgres_io import (
    ScratchPostgres,
    postgres_available,
)

pytestmark = pytest.mark.skipif(
    not postgres_available(), reason="postgres binaries not on PATH"
)


@pytest.fixture(scope="module")
def pg():
    srv = ScratchPostgres()
    yield srv
    srv.close()


def test_copy_roundtrip_nulls_escapes_unicode(pg):
    pg.sql("CREATE TABLE t_esc (id BIGINT, v TEXT)")
    rows = [
        (1, None),
        (2, ""),
        (3, "tab\there"),
        (4, "line\nbreak"),
        (5, "back\\slash"),
        (6, "quote\"and'quote"),
        (7, "héllo wörld — ünïcode ✓"),
        (8, "\\N"),  # the literal two-char string, NOT a null
    ]
    pg.copy_in("t_esc", rows)
    out = pg.copy_out("SELECT id, v FROM t_esc ORDER BY id")
    got = [(int(i), v) for i, v in out]
    assert got == rows
    # NULL vs empty string vs literal backslash-N stay distinct
    assert got[0][1] is None and got[1][1] == "" and got[7][1] == "\\N"


def test_postgres_dialect_behaviors_used_by_crud(pg):
    # text || bigint concatenation (the UPDATE statement's expression)
    assert pg.sql("SELECT 'updated-' || 42").strip() == "updated-42"
    # modulo on negative ids is truncation semantics (matches Spark %)
    assert pg.sql("SELECT (-7) % 5").strip() == "-2"
    # PRIMARY KEY enforces the upsert discipline's uniqueness
    pg.sql("CREATE TABLE t_pk (id BIGINT PRIMARY KEY)")
    pg.sql("INSERT INTO t_pk VALUES (1)")
    with pytest.raises(RuntimeError, match="duplicate key"):
        pg.sql("INSERT INTO t_pk VALUES (1)")


def test_postgres_type_roundtrip(pg):
    pg.sql(
        "CREATE TABLE t_types (id BIGINT, d DOUBLE PRECISION, "
        "n NUMERIC(12,2), ts TIMESTAMP, b BOOLEAN, dt DATE)"
    )
    pg.copy_in(
        "t_types",
        [
            (1, "1.5", "12345.67", "2024-02-29 23:59:59.123456", "t",
             "2024-02-29"),
            (2, None, None, None, None, None),
        ],
    )
    out = pg.copy_out(
        "SELECT id, d, n, ts, b, dt FROM t_types ORDER BY id"
    )
    assert out[0] == [
        "1", "1.5", "12345.67", "2024-02-29 23:59:59.123456", "t",
        "2024-02-29",
    ]
    assert out[1] == ["2", None, None, None, None, None]


def test_partitioned_scan_ranges_are_disjoint_and_parallel(spark, sf_smoke):
    """The Python-Data-Source scan must (a) split the key space into
    disjoint covering ranges (no boundary row lost or duplicated — the
    classic off-by-one of partitioned JDBC reads), and (b) actually
    read through MULTIPLE input partitions."""
    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.sources.postgres_io import (
        _PgCopyReader,
        postgres_partitioned_scan,
    )

    reader = _PgCopyReader(
        {
            "dir": "/x", "user": "u", "table": "t",
            "partition_column": "id", "lower_bound": "1",
            "upper_bound": "10", "num_partitions": "4",
        },
        "id bigint, content string",
    )
    parts = reader.partitions()
    assert len(parts) == 4
    bounds = [(p.lo, p.hi) for p in parts]
    # contiguous, disjoint, covering [1, 10] inclusive
    assert bounds[0][0] == 1 and bounds[-1][1] > 10
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert b == c and a < b

    df = postgres_partitioned_scan(spark, sf_smoke)
    per_part = (
        df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert len(per_part) > 1, "scan ran through a single partition"
    total = sum(r["count"] for r in per_part)
    assert total == df.count()


def test_pushdown_translates_supported_filters_and_yields_residuals():
    """`pushFilters` must translate the supported conjuncts into
    Postgres WHERE clauses (so rejected rows never leave the server)
    and yield everything else back for Spark to apply residually —
    accepting a filter it cannot express would silently change
    results."""
    from pyspark.sql.datasource import (
        EqualNullSafe,
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
        StringContains,
    )

    from cdc_cloudrun_demo_spark.sources.postgres_io import _PgCopyReader

    r = _PgCopyReader(
        {
            "dir": "/x", "user": "u", "table": "t",
            "partition_column": "id", "lower_bound": "1",
            "upper_bound": "10", "num_partitions": "2",
        },
        "id bigint, content string",
    )
    residual = list(
        r.pushFilters(
            [
                GreaterThan(("id",), 10),
                EqualTo(("content",), "o'brien"),
                StringContains(("content",), "50%_x"),
                In(("id",), (1, 2, 3)),
                IsNotNull(("content",)),
                EqualNullSafe(("id",), 5),  # unsupported -> residual
            ]
        )
    )
    assert r.pushed == [
        "id > 10",
        "content = 'o''brien'",
        "content LIKE '%50\\%\\_x%'",
        "id IN (1, 2, 3)",
        "content IS NOT NULL",
    ]
    assert len(residual) == 1 and isinstance(residual[0], EqualNullSafe)


def test_partitioned_scan_claims_null_keys_exactly_once(spark):
    """A NULL partition key falls outside every range predicate — the
    first split claims NULLs (the spark.read.jdbc convention), so the
    row is neither dropped nor read twice."""
    from cdc_cloudrun_demo_spark.sources.postgres_io import (
        PostgresCopySource,
        ScratchPostgres,
    )

    pg = ScratchPostgres()
    try:
        pg.sql("CREATE TABLE t_nk (id BIGINT, content TEXT)")
        pg.copy_in("t_nk", [(1, "a"), (None, "null-key"), (9, "z")])
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(PostgresCopySource)
        rows = (
            spark.read.format("pg_copy")
            .option("dir", pg.dir)
            .option("user", pg._user)
            .option("table", "t_nk")
            .option("partition_column", "id")
            .option("lower_bound", 1)
            .option("upper_bound", 9)
            .option("num_partitions", 3)
            .load()
            .collect()
        )
        got = sorted(
            ((r["id"], r["content"]) for r in rows),
            key=lambda t: (t[0] is not None, t[0] or 0),
        )
        assert got == [(None, "null-key"), (1, "a"), (9, "z")]
    finally:
        pg.close()


def test_write_two_phase_commit_failure_leaves_target_untouched(spark):
    """The distributed writer's atomicity contract: (a) a failing
    driver-side publish (PK violation inside the BEGIN..COMMIT fold)
    rolls the WHOLE load back — the target keeps exactly its prior
    rows; (b) a failing write TASK triggers abort, which drops the
    staging tables and never touches the target."""
    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.sources.postgres_io import (
        PostgresCopySource,
        ScratchPostgres,
    )

    pg = ScratchPostgres()
    try:
        pg.sql("CREATE TABLE message (id BIGINT PRIMARY KEY, content TEXT)")
        pg.copy_in("message", [(1, "original")])
        spark.dataSource.register(PostgresCopySource)

        def attempt(df):
            (
                df.write.format("pg_copy")
                .option("dir", pg.dir)
                .option("user", pg._user)
                .option("table", "message")
                .mode("append")
                .save()
            )

        # (a) publish-time failure: id 1 collides with the standing row
        dup = spark.createDataFrame(
            [(1, "dup"), (2, "two")], "id long, content string"
        ).repartition(2)
        with pytest.raises(Exception, match="duplicate key|psql failed"):
            attempt(dup)
        rows = pg.copy_out("SELECT id, content FROM message ORDER BY id")
        assert [(int(i), c) for i, c in rows] == [(1, "original")]

        # (b) task-time failure: one partition raises mid-write
        @F.udf("long")
        def boom(x):
            raise ValueError("injected task failure")

        bad = spark.createDataFrame(
            [(3, "three")], "id long, content string"
        ).select(boom(F.col("id")).alias("id"), "content")
        with pytest.raises(Exception):
            attempt(bad)
        rows = pg.copy_out("SELECT id, content FROM message ORDER BY id")
        assert [(int(i), c) for i, c in rows] == [(1, "original")]
        # a straggler task may re-create its stage after abort's sweep
        # (it was mid-write when the job died); the NEXT write job's
        # driver-side setup pre-cleans that debris, and a successful
        # load lands exactly its own rows with zero stages left
        ok = spark.createDataFrame(
            [(5, "five")], "id long, content string"
        )
        attempt(ok)
        rows = pg.copy_out("SELECT id, content FROM message ORDER BY id")
        assert [(int(i), c) for i, c in rows] == [
            (1, "original"),
            (5, "five"),
        ]
        leftovers = pg.sql(
            "SELECT COUNT(*) FROM pg_tables "
            "WHERE tablename LIKE 'message__stage%'"
        ).strip()
        assert leftovers == "0", "staging tables leaked after commit"
    finally:
        pg.close()


def test_cdc_sink_matches_batch_fold_and_replay_is_exactly_once(
    spark, sf_smoke
):
    """The streamed Postgres state equals the engine's batch LWW fold,
    and a REPLAYED batch (same batch id re-applied — the foreachBatch
    crash-recovery case) is recognized by the `_applied` claim inside
    the merge transaction and leaves the state byte-identical."""
    from cdc_cloudrun_demo_spark.operators.cdc import cdc_materialize
    from cdc_cloudrun_demo_spark.sources.postgres_io import (
        _SERVERS,
        _psql_script,
        postgres_cdc_sink,
    )

    got = {
        tuple(r)
        for r in postgres_cdc_sink(spark, sf_smoke).collect()
    }
    want = {tuple(r) for r in cdc_materialize(spark, sf_smoke).collect()}
    assert got == want and got
    pg = _SERVERS[-1]  # the sink's still-alive scratch server
    before = pg.copy_out(
        "SELECT id, content, last_seq FROM message_state ORDER BY id"
    )
    # replay batch 0: the _applied PRIMARY KEY aborts the whole merge
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="_applied_pkey"):
        _psql_script(
            pg.dir, pg._user,
            "BEGIN;\nINSERT INTO _applied VALUES (0);\n"
            "DELETE FROM message_state;\nCOMMIT;\n",
        )
    after = pg.copy_out(
        "SELECT id, content, last_seq FROM message_state ORDER BY id"
    )
    assert after == before, "replayed transaction mutated the state"


def test_crud_lifecycle_on_real_postgres(spark, sf_smoke):
    """The registry entry end-to-end at smoke scale: seed → COPY in →
    UPDATE/DELETE/INSERT executed BY Postgres → COPY out, equal to the
    engine-side closed form computed in Spark."""
    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.catalog import load_for_compute
    from cdc_cloudrun_demo_spark.sources.postgres_io import (
        postgres_message_roundtrip,
    )

    got = {
        (r["id"], r["content"])
        for r in postgres_message_roundtrip(spark, sf_smoke).collect()
    }
    seed = (
        load_for_compute(spark, sf_smoke, "customer")
        .filter(F.col("c_custkey").isNotNull())
        .select(
            F.col("c_custkey").cast("long").alias("id"),
            F.col("c_name").cast("string").alias("content"),
        )
    )
    kept = (
        seed.filter(F.col("id") % 9 != 2)
        .select(
            "id",
            F.when(
                F.col("id") % 7 == 1,
                F.concat(F.lit("updated-"), F.col("id").cast("string")),
            )
            .otherwise(F.col("content"))
            .alias("content"),
        )
        .collect()
    )
    m = seed.agg(F.max("id")).first()[0] or 0
    want = {(r["id"], r["content"]) for r in kept} | {
        (m + j, f"posted-{j}") for j in range(1, 4)
    }
    assert got == want
