"""A long-running HTTP serve loop over the engine's CDC primitives —
the executable analog of the reference's one user-facing surface
(``MessageController.java:17-45``: GET/POST ``/messages``, GET/PUT/
DELETE ``/messages/{id}`` over the ``Message(id, content)`` entity,
``Message.java``).

Architecture (Spark-first, not a toy dict):

- **Writes are change events, not mutations.** Every mutating request
  appends an (id, content, op, seq) event to an in-memory WAL buffer;
  the buffer FLUSHES as one parquet micro-batch under
  ``log_dir/batch=<seq>/`` on the next read (or explicit ``flush()``)
  — the same micro-batching discipline as the streaming sinks, so a
  thousand writes cost one Spark job, never one job per request.
- **Reads run the engine's LWW fold.** The served state is the CDC
  materialization of the whole change log (latest event per id wins,
  tombstones drop — `operators/cdc.py`'s discipline), computed once
  per log version and cached; GET endpoints answer from that cached
  DataFrame. A server restarted over the same ``log_dir`` recovers
  the identical state from the durable log (tested).
- **The hot-path metadata is bounded driver state.** The live-id set
  and the next generated key (IDENTITY semantics: max id EVER
  assigned + 1, never reused after a delete —
  ``Message.java:@GeneratedValue``) live in memory like any serving
  tier's PK index; the CONTENT state stays in Spark. At 100 TB the
  id set would move to a state store / bloom probe — the contract
  documented in docs/SCALE.md; the fold itself is already the
  distributed path.
- **Concurrent reads, single-writer state.** The loop is a
  ``ThreadingHTTPServer`` (the reference's Cloud Run envelope is 80
  concurrent requests per container, ``terraform/cloud_run.tf`` /
  ``README.md:293``): requests overlap at the HTTP layer, while ONE
  mutex serializes exactly the state transitions (WAL append, flush,
  fold refresh, PK-index/counter updates). Readers leave the lock
  BEFORE their Spark action — they collect from an immutable
  already-pinned fold snapshot, so N concurrent GETs run N concurrent
  Spark jobs against one state version (pair with fair-scheduler
  pools, `session.scoped_pool`, for isolation).

Endpoint map (reference parity):

    GET    /messages          → findAll()        (S1)
    POST   /messages          → save(new)        (S3, generated key)
    GET    /messages/{id}     → findById()       (S2; null body if absent)
    PUT    /messages/{id}     → update content   (S4; null if absent,
                                                  never creates)
    DELETE /messages/{id}     → deleteById()     (S5, tombstone)
    GET    /healthz           → liveness + log version (S8)
    GET    /db-info[/test]    → DatabaseInfoResource.java (S6 count,
                                S7 first-row, S9 backend identity)
    GET    /metrics[/startup|/memory] → MetricsController.java
                                (M1 derived scalars, M2 nested maps)
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MESSAGE_EVENT_SCHEMA = "id long, content string, op string, seq long"


class MessageServer:
    """The serve loop. ``seed`` (optional DataFrame of (id, content))
    initializes an EMPTY log with insert events — re-seeding an
    existing log is ignored, so restart recovery is log-authoritative.
    ``port=0`` binds an ephemeral port (read it back from ``.port``)."""

    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        seed: DataFrame | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        import time

        t_boot = time.monotonic()
        self.spark = spark
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._requests = 0
        self._flushes = 0
        # ONE mutex serializes state transitions; readers collect from
        # immutable fold snapshots OUTSIDE it (module docstring)
        self._mu = threading.RLock()
        self._pending: list[tuple] = []
        self._state_df: DataFrame | None = None
        batches = [
            int(d.split("=", 1)[1])
            for d in os.listdir(log_dir)
            if d.startswith("batch=")
        ]
        self._seq = max(batches) + 1 if batches else 0
        if self._seq == 0 and seed is not None:
            for r in seed.select("id", "content").collect():
                # the seed is the message table itself — bounded by the
                # serving contract (the reference serves this table as
                # one JSON response); see VETTED in tests/test_scale_lint
                self._pending.append((r["id"], r["content"], "I"))
        # recover bounded metadata from the durable log: live ids and
        # the max id EVER assigned (IDENTITY: deletes never free keys)
        log = self._log_df()
        w = Window.partitionBy("id").orderBy(F.desc("seq"))
        rows = (
            log.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", (F.col("op") != "D").alias("live"))
            .collect()
        )
        self._live = {r["id"] for r in rows if r["live"]}
        ever = log.agg(F.max("id")).first()[0]
        pend_ids = [i for i, _c, _o in self._pending if i is not None]
        self._next_id = (
            max([ever or 0] + pend_ids) + 1 if (ever or pend_ids) else 1
        )
        for i, _c, op in self._pending:
            if op == "I" and i is not None:
                self._live.add(i)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, obj, status=200):
                with server._mu:
                    server._requests += 1
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _id(self):
                parts = self.path.rstrip("/").split("/")
                try:
                    return int(parts[-1])
                except ValueError:
                    return None

            def _body(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def handle_one_request(self):
                # a malformed request must answer with a status, not
                # kill the connection with a traceback (Spring returns
                # 400 for unparseable bodies)
                try:
                    super().handle_one_request()
                except json.JSONDecodeError:
                    self._reply({"error": "malformed JSON body"}, 400)
                except Exception as e:  # pragma: no cover - defensive
                    try:
                        self._reply({"error": str(e)[:200]}, 500)
                    except Exception:
                        pass

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(
                        {"status": "UP", "log_version": server._seq}
                    )
                elif self.path.rstrip("/") == "/metrics":
                    self._reply(server.metrics())
                elif self.path.rstrip("/") == "/metrics/startup":
                    # MetricsController.java:89-100 sub-view
                    m = server.metrics()
                    self._reply(
                        {
                            k: m[k]
                            for k in (
                                "imageType", "startupTimeMs",
                                "startupTimeSeconds", "profile",
                            )
                        }
                    )
                elif self.path.rstrip("/") == "/metrics/memory":
                    # MetricsController.java:102-118 sub-view
                    self._reply(server.metrics()["memory"])
                elif self.path.rstrip("/") == "/db-info":
                    self._reply(server.db_info())
                elif self.path.rstrip("/") == "/db-info/test":
                    self._reply(server.db_test())
                elif self.path.rstrip("/") == "/messages":
                    self._reply(server.find_all())
                else:
                    self._reply(server.find_by_id(self._id()))

            def do_POST(self):
                self._reply(server.create(self._body().get("content")))

            def do_PUT(self):
                self._reply(
                    server.update(self._id(), self._body().get("content"))
                )

            def do_DELETE(self):
                server.delete(self._id())
                self._reply(None)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        self._t0_monotonic = time.monotonic()
        # recovery + bind time — the reference's applicationStartupMillis
        self._startup_ms = int((self._t0_monotonic - t_boot) * 1000)

    # -- engine side -------------------------------------------------
    def _log_df(self) -> DataFrame:
        dirs = [
            os.path.join(self.log_dir, d)
            for d in sorted(os.listdir(self.log_dir))
            if d.startswith("batch=")
        ]
        if not dirs:
            return self.spark.createDataFrame([], MESSAGE_EVENT_SCHEMA)
        return self.spark.read.schema(MESSAGE_EVENT_SCHEMA).parquet(*dirs)

    def flush(self) -> None:
        """Land the WAL buffer as ONE parquet micro-batch (ordinal
        within the batch rides the fractional part of seq via row
        position — LWW needs total order, and a PUT after an INSERT of
        the same id in one buffer must win). Caller holds or takes
        the state mutex; an in-flight reader's snapshot stays valid
        (batch dirs are append-only and unpersist only drops cache)."""
        with self._mu:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._pending:
            return
        rows = [
            (i, c, op, self._seq * 1_000_000 + j)
            for j, (i, c, op) in enumerate(self._pending)
        ]
        (
            self.spark.createDataFrame(rows, MESSAGE_EVENT_SCHEMA)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(self.log_dir, f"batch={self._seq}"))
        )
        self._pending.clear()
        self._seq += 1
        self._flushes += 1
        if self._state_df is not None:
            self._state_df.unpersist()
        self._state_df = None

    def _state(self) -> DataFrame:
        """The LWW materialization of the full change log, cached per
        log version — `cdc_materialize`'s fold serving reads."""
        with self._mu:
            return self._state_locked()

    def _state_locked(self) -> DataFrame:
        self._flush_locked()
        if self._state_df is None:
            log = self._log_df()
            w = Window.partitionBy("id").orderBy(F.desc("seq"))
            self._state_df = (
                log.withColumn("rn", F.row_number().over(w))
                .filter((F.col("rn") == 1) & (F.col("op") != "D"))
                .select("id", "content")
                .persist()
            )
        return self._state_df

    # -- repository operations (MessageController.java parity) ------
    def find_all(self) -> list[dict]:
        st = self._state()  # snapshot pinned under the mutex
        return [
            {"id": r["id"], "content": r["content"]}
            for r in st.orderBy("id").collect()  # collected outside it
        ]

    def find_by_id(self, mid) -> dict | None:
        with self._mu:
            if mid is None or mid not in self._live:
                return None  # reference returns a null body, status 200
            st = self._state_locked()
        r = st.filter(F.col("id") == mid).first()
        return None if r is None else {"id": r["id"], "content": r["content"]}

    def create(self, content) -> dict:
        with self._mu:
            mid = self._next_id
            self._next_id += 1
            self._pending.append((mid, content, "I"))
            self._live.add(mid)
        return {"id": mid, "content": content}

    def update(self, mid, content) -> dict | None:
        with self._mu:
            if mid is None or mid not in self._live:
                return None  # PUT never creates (findById().map)
            self._pending.append((mid, content, "U"))
        return {"id": mid, "content": content}

    def delete(self, mid) -> None:
        with self._mu:
            if mid is not None and mid in self._live:
                self._pending.append((mid, None, "D"))
                self._live.discard(mid)

    def metrics(self) -> dict:
        """`MetricsController.getMetrics` analog
        (MetricsController.java:34-88): startup/uptime, memory with
        the reference's exact formatting discipline (%.3f seconds,
        %.2f MB, %.1f%% usage — the M1 derived-metric shapes), nested
        sub-maps (M2) and an ISO timestamp — computed from THIS serve
        loop's runtime instead of a JVM MXBean, plus the serving
        counters a data-engine process actually monitors (log version,
        request and flush counts)."""
        import resource
        import time
        from datetime import datetime, timezone

        up_ms = int((time.monotonic() - self._t0_monotonic) * 1000)
        ru = resource.getrusage(resource.RUSAGE_SELF)
        used_mb = ru.ru_maxrss / 1024.0  # linux reports KiB
        budget_mb = 128 * 1024.0  # the local[32] harness's heap budget
        return {
            "application": "spark-cdc-engine",
            "profile": "local",
            "imageType": "JVM (Spark driver)",
            "connectionPool": "parquet-change-log",
            "startupTimeMs": self._startup_ms,
            "startupTimeSeconds": f"{self._startup_ms / 1000.0:.3f}",
            "uptimeMs": up_ms,
            "uptimeSeconds": f"{up_ms / 1000.0:.3f}",
            "memory": {
                "usedMB": f"{used_mb:.2f}",
                "maxMB": f"{budget_mb:.2f}",
                "usagePercent": f"{used_mb * 100.0 / budget_mb:.1f}%",
            },
            "serving": {
                "logVersion": self._seq,
                "requests": self._requests,
                "flushes": self._flushes,
                "liveMessages": len(self._live),
            },
            "timestamp": datetime.now(timezone.utc).isoformat(),
        }

    def db_info(self) -> dict:
        """`DatabaseInfoResource.getDatabaseInfo` analog
        (DatabaseInfoResource.java:24-53): backend identity + record
        counts, served from the fold (S6)."""
        return {
            "databaseProductName": "spark+parquet-change-log",
            "connected": True,
            "recordCounts": {"Message": self._state().count()},
            "logVersion": self._seq,
        }

    def db_test(self) -> dict:
        """`DatabaseInfoResource.testConnection` analog
        (DatabaseInfoResource.java:56-86): count + first sample record
        (S6 + S7). ``firstResult`` here is first-by-PK — deterministic
        where the reference's heap order is incidental."""
        st = self._state()
        n = st.count()
        out: dict = {"status": "SUCCESS", "messageCount": n}
        if n > 0:
            r = st.orderBy("id").first()
            out["sampleMessage"] = {"id": r["id"], "content": r["content"]}
        return out

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(10)
        if self._state_df is not None:
            self._state_df.unpersist()
            self._state_df = None


def _http_json(url: str, method: str = "GET", body: dict | None = None):
    import urllib.request

    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url,
        data=data,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read() or b"null")


def serve_message_api(
    spark: SparkSession,
    sf_dir: str,
    upd_mod: int = 7,
    upd_rem: int = 1,
    del_mod: int = 9,
    del_rem: int = 2,
    n_posts: int = 3,
) -> DataFrame:
    """The serve loop exercised END-TO-END over real HTTP — the
    registry face of the reference's REST lifecycle: seed the message
    table from the customer table (c_custkey → id, c_name → content,
    PKs non-null by the serving contract), then as an HTTP CLIENT
    update every id ≡ upd_rem (mod upd_mod), delete every id ≡ del_rem
    (mod del_mod), insert ``n_posts`` new messages (generated keys —
    max seed id + 1.., the IDENTITY discipline), and return the final
    GET /messages as a DataFrame. Every mutation traveled the socket,
    the WAL buffer, the parquet change log and the LWW fold — the
    DuckDB oracle computes the same lifecycle in closed form, so the
    served state hash-matches. Scale shape: requests are O(1) driver
    work; all content state flows through one micro-batch append + one
    keyed-window fold per log version (the CDC materializer's plan)."""
    from .._scratch import scratch_dir
    from ..catalog import load_for_compute

    seed = (
        load_for_compute(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isNotNull())
        .select(
            F.col("c_custkey").cast("long").alias("id"),
            F.col("c_name").cast("string").alias("content"),
        )
    )
    srv = MessageServer(spark, scratch_dir("msg_api_"), seed=seed)
    try:
        base = f"http://127.0.0.1:{srv.port}/messages"
        # the request script enumerates the table's PKs client-side —
        # the reference's own benchmark clients do the same
        # (compare_services.sh drives the API over known ids)
        ids = sorted(r["id"] for r in seed.select("id").collect())
        for i in ids:
            if i % upd_mod == upd_rem:
                _http_json(
                    f"{base}/{i}", "PUT", {"content": f"updated-{i}"}
                )
        for i in ids:
            if i % del_mod == del_rem:
                _http_json(f"{base}/{i}", "DELETE")
        for j in range(1, n_posts + 1):
            created = _http_json(base, "POST", {"content": f"posted-{j}"})
            assert created["id"] == (max(ids) if ids else 0) + j
        rows = _http_json(base)
        out = spark.createDataFrame(
            [(r["id"], r["content"]) for r in rows],
            "id long, content string",
        )
        return out
    finally:
        srv.close()


def serve_db_info(
    spark: SparkSession,
    sf_dir: str,
    del_mod: int = 9,
    del_rem: int = 2,
    n_posts: int = 2,
) -> DataFrame:
    """The reference's introspection endpoint served live
    (``DatabaseInfoResource.java:56-86``, GET /db-info/test: record
    count + first sample record): seed the message table from the
    customer table, mutate it over HTTP (delete every id ≡ del_rem mod
    del_mod, then insert ``n_posts``), and return the endpoint's
    response — (status, message_count, sample_id, sample_content) —
    as a 1-row DataFrame. Count is S6 and the sample is S7, both
    answered from the LWW fold of the change log the requests wrote;
    the DuckDB oracle computes the same lifecycle in closed form."""
    from .._scratch import scratch_dir
    from ..catalog import load_for_compute

    seed = (
        load_for_compute(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isNotNull())
        .select(
            F.col("c_custkey").cast("long").alias("id"),
            F.col("c_name").cast("string").alias("content"),
        )
    )
    srv = MessageServer(spark, scratch_dir("msg_dbinfo_"), seed=seed)
    try:
        base = f"http://127.0.0.1:{srv.port}"
        ids = sorted(r["id"] for r in seed.select("id").collect())
        for i in ids:
            if i % del_mod == del_rem:
                _http_json(f"{base}/messages/{i}", "DELETE")
        for j in range(1, n_posts + 1):
            _http_json(
                f"{base}/messages", "POST", {"content": f"posted-{j}"}
            )
        info = _http_json(f"{base}/db-info/test")
        sample = info.get("sampleMessage") or {}
        return spark.createDataFrame(
            [
                (
                    info["status"],
                    info["messageCount"],
                    sample.get("id"),
                    sample.get("content"),
                )
            ],
            "status string, message_count long, sample_id long, "
            "sample_content string",
        )
    finally:
        srv.close()


def _db_info_oracle() -> str:
    import inspect

    d = {
        p.name: p.default
        for p in inspect.signature(serve_db_info).parameters.values()
    }
    dm, dr, np_ = d["del_mod"], d["del_rem"], d["n_posts"]
    return f"""
        WITH seed AS (
            SELECT c_custkey AS id, CAST(c_name AS VARCHAR) AS content
            FROM customer WHERE c_custkey IS NOT NULL
        ), mx AS (
            SELECT COALESCE(MAX(id), 0) AS m FROM seed
        ), kept AS (
            SELECT id, content FROM seed WHERE id % {dm} <> {dr}
        ), posted AS (
            SELECT m + i AS id, 'posted-' || CAST(i AS VARCHAR) AS content
            FROM mx CROSS JOIN (
                SELECT UNNEST(generate_series(1, {np_})) AS i
            )
        ), final AS (
            SELECT id, content FROM kept
            UNION ALL
            SELECT id, content FROM posted
        )
        SELECT 'SUCCESS' AS status,
               (SELECT COUNT(*) FROM final) AS message_count,
               f.id AS sample_id, f.content AS sample_content
        FROM (SELECT id, content FROM final ORDER BY id LIMIT 1) f
    """


def _serve_oracle() -> str:
    import inspect

    d = {
        p.name: p.default
        for p in inspect.signature(serve_message_api).parameters.values()
    }
    um, ur, dm, dr, np_ = (
        d["upd_mod"], d["upd_rem"], d["del_mod"], d["del_rem"], d["n_posts"],
    )
    return f"""
        WITH seed AS (
            SELECT c_custkey AS id, CAST(c_name AS VARCHAR) AS content
            FROM customer WHERE c_custkey IS NOT NULL
        ), mx AS (
            SELECT COALESCE(MAX(id), 0) AS m FROM seed
        ), updated AS (
            SELECT id,
                   CASE WHEN id % {um} = {ur}
                        THEN 'updated-' || CAST(id AS VARCHAR)
                        ELSE content END AS content
            FROM seed WHERE id % {dm} <> {dr}
        ), posted AS (
            SELECT m + i AS id, 'posted-' || CAST(i AS VARCHAR) AS content
            FROM mx CROSS JOIN (
                SELECT UNNEST(generate_series(1, {np_})) AS i
            )
        )
        SELECT id, content FROM updated
        UNION ALL
        SELECT id, content FROM posted
    """


QUERIES = {
    "serve_message_api": serve_message_api,
    "serve_db_info": serve_db_info,
}
ORACLES = {
    "serve_message_api": _serve_oracle(),
    "serve_db_info": _db_info_oracle(),
}
