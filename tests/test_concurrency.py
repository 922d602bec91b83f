"""Concurrent-query envelope — the engine analog of the reference's
concurrent request handling (HikariCP pool of 5 + PgBouncer multiplexing,
hello_cloud_run/src/main/resources/application-cloud-sql.properties:16-20,
terraform/database.tf:27-31; SURVEY.md §4 maps this to one shared session
serving overlapping queries).

Two hazards these tests pin down (round-4 review):
* shared posting machinery (dedup_ngram_jaccard / dedup_containment both
  build capped posting lists) — after the round-5 rewrite there is NO
  module-global posting cache at all, so interleaving cannot evict
  anything; both results must stay oracle-green when computed in
  overlapping threads;
* bucketed-table generations (operators/joins.py) — per-call uuid table
  names + per-session generation GC under a lock: two concurrent
  join_bucketed_colocated calls on ONE session must not drop each
  other's tables before the (lazy) results are read.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tests.oracle_check import compare_one, duck_connection


def _run_green(spark, sf_dir, name):
    from cdc_cloudrun_demo_spark.operators import registry

    queries, oracles = registry()
    df = queries[name](spark, sf_dir)
    rows = df.collect()  # materialize INSIDE the thread, while others run
    con = duck_connection(sf_dir)  # duckdb connections are not thread-safe: one per thread
    res = compare_one(spark, con, name, lambda s, d: df, oracles[name], sf_dir)
    con.close()
    return name, res, len(rows)


def test_concurrent_posting_family_oracle_green(spark, sf_oracle):
    """dedup_ngram_jaccard + dedup_containment share the posting-list
    machinery; run them in overlapping threads on one session and
    assert BOTH results still match their oracles exactly."""
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(_run_green, spark, sf_oracle, "dedup_ngram_jaccard"),
            pool.submit(_run_green, spark, sf_oracle, "dedup_containment"),
        ]
        results = [f.result(timeout=300) for f in futs]
    for name, res, _ in results:
        assert res.ok, f"{name} diverged under concurrency: {res.detail}"


def test_concurrent_bucketed_join_oracle_green(spark, sf_oracle):
    """Two join_bucketed_colocated calls racing on one session: per-call
    unique table names + locked per-session generation GC must keep both
    lazy results readable and oracle-green."""
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(_run_green, spark, sf_oracle, "join_bucketed_colocated")
            for _ in range(2)
        ]
        results = [f.result(timeout=300) for f in futs]
    for name, res, _ in results:
        assert res.ok, f"{name} diverged under concurrency: {res.detail}"


def test_concurrent_mixed_families(spark, sf_oracle):
    """A four-way mix across operator families on one session — the
    closest local analog of the reference's pool-of-5 envelope."""
    names = [
        "dedup_ngram_jaccard",
        "join_bucketed_colocated",
        "agg_pricing_summary",
        "win_running_total",
    ]
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(_run_green, spark, sf_oracle, n) for n in names]
        results = [f.result(timeout=300) for f in futs]
    for name, res, _ in results:
        assert res.ok, f"{name} diverged under concurrency: {res.detail}"


def test_fair_pools_isolate_concurrent_callers(spark, sf_oracle):
    """PgBouncer-multiplexing analog (SURVEY §4): two callers in separate
    fair-scheduler pools on one session. Asserts (a) the session built by
    get_spark schedules FAIR, (b) the pool property is thread-confined —
    each thread sees exactly its own pool while running — and (c) both
    pooled queries stay oracle-green."""
    from cdc_cloudrun_demo_spark.session import scoped_pool

    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"

    def run_pooled(name, pool_name):
        with scoped_pool(spark, pool_name):
            seen = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
            res = _run_green(spark, sf_oracle, name)
            return seen, res
        # pool restored on exit (asserted below via the main thread)

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(run_pooled, "agg_pricing_summary", "etl")
        f2 = pool.submit(run_pooled, "qx_custdist", "adhoc")
        (seen1, (n1, r1, _)) = f1.result(timeout=300)
        (seen2, (n2, r2, _)) = f2.result(timeout=300)
    assert seen1 == "etl" and seen2 == "adhoc"
    assert r1.ok, f"{n1} diverged in pool etl: {r1.detail}"
    assert r2.ok, f"{n2} diverged in pool adhoc: {r2.detail}"
    # the main thread's pool was never touched by the workers
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None


def test_two_spark_sessions_concurrent_oracle_green(spark, sf_oracle):
    """TWO SparkSessions (newSession(): isolated SQL conf / temp views /
    current database over one shared SparkContext) driving the posting
    and bucketed-join families concurrently — the way the reference
    actually runs: multiple service instances multiplexed onto one
    database (PgBouncer, terraform/database.tf:27-31), here multiple
    sessions multiplexed onto one cluster. Both sides must stay
    oracle-green: the posting machinery holds no module-global state
    and the bucketed-join generation GC is keyed per-session, so
    neither session may observe or evict the other's intermediate
    state (round-5 advice item 8)."""
    s1 = spark.newSession()
    s2 = spark.newSession()
    assert s1 is not spark and s2 is not spark and s1 is not s2

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(_run_green, s1, sf_oracle, "dedup_ngram_jaccard")
        f2 = pool.submit(_run_green, s2, sf_oracle, "join_bucketed_colocated")
        n1, r1, _ = f1.result(timeout=300)
        n2, r2, _ = f2.result(timeout=300)
    assert r1.ok, f"{n1} diverged across sessions: {r1.detail}"
    assert r2.ok, f"{n2} diverged across sessions: {r2.detail}"


def test_cds_option_selection(monkeypatch, tmp_path):
    """The AppCDS flag machinery (session.py): archive present -> map it
    read-only; absent -> schedule a dump at exit under OUR empty conf
    dir; a user-managed SPARK_CONF_DIR -> no CDS at all (the dump flag
    would fatally abort JVM launch on a non-empty classpath directory).
    Promotion takes the newest per-pid dump, atomically, and drops the
    rest. Pure-python — no JVM launched."""
    import os

    import cdc_cloudrun_demo_spark.session as S

    cds_dir = str(tmp_path / "cds")
    monkeypatch.setattr(S, "_CDS_DIR", cds_dir)
    monkeypatch.delenv("SPARK_CONF_DIR", raising=False)

    # fresh env: dump flag, conf dir redirected to the empty cache dir
    opt = S._cds_java_options()
    assert opt is not None and "-XX:ArchiveClassesAtExit=" in opt
    assert os.environ["SPARK_CONF_DIR"] == os.path.join(cds_dir, "empty_conf")
    assert os.listdir(os.environ["SPARK_CONF_DIR"]) == []

    # Incomplete dumps are never promoted — promoting one hands later
    # launches a truncated archive, which SIGBUSes the mapping JVM
    # mid-relocation (observed: FileMapInfo::relocate_pointers_in_core_
    # regions). Three incompleteness signals, each sufficient alone:
    import subprocess
    import time

    proc = subprocess.Popen(["true"])
    proc.wait()
    dead_pid = proc.pid  # a pid guaranteed dead (reaped just above)
    live = os.path.join(cds_dir, f"dump-{os.getpid()}.jsa")  # writer alive
    tiny = os.path.join(cds_dir, f"dump-{dead_pid + 1}.jsa")  # short file
    fresh = os.path.join(cds_dir, f"dump-{dead_pid + 2}.jsa")  # still warm
    big, old = b"x" * (2 << 20), time.time() - 10
    for p, body, mtime in (
        (live, big, old),
        (tiny, b"x", old),
        (fresh, big, time.time()),
    ):
        with open(p, "wb") as fh:
            fh.write(body)
        os.utime(p, (mtime, mtime))
    S._promote_cds_dump()
    assert not os.path.exists(S._cds_archive_path())
    for p in (live, tiny, fresh):
        os.remove(p)

    # completeness is necessary but no longer sufficient: a completed
    # dump whose bytes are not a CDS file-map (wrong magic) is DELETED,
    # never promoted (round-10 advice: the pid/quiescence heuristic can
    # admit a truncated flush; the validity gate must catch it)
    junk = os.path.join(cds_dir, f"dump-{dead_pid + 4}.jsa")
    with open(junk, "wb") as fh:
        fh.write(big)
    os.utime(junk, (old, old))
    S._promote_cds_dump()
    assert not os.path.exists(S._cds_archive_path())
    assert not os.path.exists(junk)

    # a completed dump (dead writer, plausible size, quiescent, valid
    # magic, probe-mappable) is promoted; superseded completed dumps
    # are dropped. A magic-prefixed body exercises the promote path
    # without a 15 s real dump: its probe JVM terminates NORMALLY
    # (header-rejected, "wrong version") — the gate only blocks the
    # crash class (truncated region data → SIGBUS), because header-
    # rejectable junk degrades cleanly under -Xshare:auto while a
    # truncated map kills the production JVM.
    cds_magic = b"\xa8\xab\x0b\xf0"
    dump = os.path.join(cds_dir, f"dump-{dead_pid}.jsa")
    older = os.path.join(cds_dir, f"dump-{dead_pid + 3}.jsa")
    for i, p in enumerate((older, dump)):
        with open(p, "wb") as fh:
            fh.write(cds_magic + big)
        os.utime(p, (old + i, old + i))
    opt = S._cds_java_options()
    assert opt is not None and "-XX:SharedArchiveFile=" in opt
    assert "-Xshare:auto" in opt  # never a hard requirement
    assert os.path.exists(S._cds_archive_path())
    assert not os.path.exists(dump) and not os.path.exists(older)

    # user-managed conf dir: CDS must step aside entirely
    monkeypatch.setenv("SPARK_CONF_DIR", str(tmp_path / "user_conf"))
    assert S._cds_java_options() is None


def test_cds_truncated_archive_fails_probe():
    """The SIGBUS class itself, end-to-end: truncate the REAL promoted
    archive to half and the map probe must reject it (the probe JVM
    crashes in the throwaway process — exit 134 observed — instead of
    a later production JVM). The intact archive must pass. Skipped
    when no archive has been dumped in this environment yet."""
    import os
    import shutil
    import tempfile

    import pytest

    import cdc_cloudrun_demo_spark.session as S

    archive = S._cds_archive_path()
    if not os.path.exists(archive):
        pytest.skip("no promoted CDS archive in this environment")
    assert S._cds_archive_valid(archive)
    with tempfile.TemporaryDirectory() as td:
        trunc = os.path.join(td, "trunc.jsa")
        shutil.copy(archive, trunc)
        os.truncate(trunc, os.path.getsize(archive) // 2)
        assert not S._cds_archive_valid(trunc)
