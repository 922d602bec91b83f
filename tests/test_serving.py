"""The live REST serve loop (serving/rest_api.py) — reference parity
for MessageController.java's five endpoints, exercised over a real
socket, plus the engine-side contracts the controller can't see:
durable change-log recovery and LWW-within-a-buffer ordering."""

from __future__ import annotations

import json
import urllib.request


def _req(base, path, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(
        base + path,
        data=data,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r, timeout=30) as resp:
        return resp.status, json.loads(resp.read() or b"null")


def test_rest_crud_lifecycle_over_http(spark, tmp_path):
    from cdc_cloudrun_demo_spark.serving import MessageServer

    seed = spark.createDataFrame(
        [(1, "one"), (2, "two"), (5, "five")], "id long, content string"
    )
    srv = MessageServer(spark, str(tmp_path / "log"), seed=seed)
    try:
        base = f"http://127.0.0.1:{srv.port}"
        st, rows = _req(base, "/messages")
        assert st == 200
        assert rows == [
            {"id": 1, "content": "one"},
            {"id": 2, "content": "two"},
            {"id": 5, "content": "five"},
        ]
        # S2 point lookup; absent id -> null body, 200 (reference
        # orElse(null), MessageController.java:27-30)
        assert _req(base, "/messages/2")[1] == {"id": 2, "content": "two"}
        assert _req(base, "/messages/99")[1] is None
        # S3 generated key: max ever + 1, even though id 3,4 are free
        st, created = _req(base, "/messages", "POST", {"content": "six"})
        assert created == {"id": 6, "content": "six"}
        # S4 update; PUT never creates (findById().map, :32-40)
        assert _req(base, "/messages/1", "PUT", {"content": "ONE"})[1] == {
            "id": 1,
            "content": "ONE",
        }
        assert _req(base, "/messages/77", "PUT", {"content": "x"})[1] is None
        # S5 delete + the key is never reused
        _req(base, "/messages/2", "DELETE")
        assert _req(base, "/messages/2")[1] is None
        st, created = _req(base, "/messages", "POST", {"content": "seven"})
        assert created["id"] == 7
        st, rows = _req(base, "/messages")
        assert rows == [
            {"id": 1, "content": "ONE"},
            {"id": 5, "content": "five"},
            {"id": 6, "content": "six"},
            {"id": 7, "content": "seven"},
        ]
        # S8 health probe
        st, health = _req(base, "/healthz")
        assert st == 200 and health["status"] == "UP"
        # malformed body answers 400, the connection survives, and the
        # state is untouched
        import urllib.error
        import urllib.request

        bad = urllib.request.Request(
            base + "/messages",
            data=b"{not json",
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("malformed body was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        st, after_bad = _req(base, "/messages")
        assert st == 200 and len(after_bad) == 4
        # S6/S7 introspection (DatabaseInfoResource.java:24-86 parity)
        st, info = _req(base, "/db-info")
        assert info["connected"] and info["recordCounts"]["Message"] == 4
        st, t = _req(base, "/db-info/test")
        assert t["status"] == "SUCCESS" and t["messageCount"] == 4
        assert t["sampleMessage"] == {"id": 1, "content": "ONE"}
    finally:
        srv.close()


def test_metrics_endpoint_reference_shapes(spark, tmp_path):
    """`/metrics` carries the reference's derived-metric shapes
    (MetricsController.java:34-88): %.3f-second strings, %.2f MB
    memory sub-map with a %.1f%% usage, nested sub-maps, ISO
    timestamp — plus the serve loop's own counters, which must move
    with traffic (requests) and with landed write batches (flushes /
    logVersion)."""
    import re

    from cdc_cloudrun_demo_spark.serving import MessageServer

    srv = MessageServer(spark, str(tmp_path / "log"))
    try:
        base = f"http://127.0.0.1:{srv.port}"
        st, m = _req(base, "/metrics")
        assert st == 200
        assert m["application"] == "spark-cdc-engine"
        assert m["startupTimeMs"] >= 0 and m["uptimeMs"] >= 0
        assert re.fullmatch(r"\d+\.\d{3}", m["uptimeSeconds"])
        assert re.fullmatch(r"\d+\.\d{2}", m["memory"]["usedMB"])
        assert re.fullmatch(r"\d+\.\d%", m["memory"]["usagePercent"])
        assert "T" in m["timestamp"]
        v0, r0 = m["serving"]["logVersion"], m["serving"]["requests"]
        _req(base, "/messages", "POST", {"content": "x"})
        _req(base, "/messages")  # forces the flush
        st, m2 = _req(base, "/metrics")
        assert m2["serving"]["requests"] > r0
        assert m2["serving"]["logVersion"] == v0 + 1
        assert m2["serving"]["flushes"] >= 1
        assert m2["serving"]["liveMessages"] == 1
        assert m2["uptimeMs"] >= m["uptimeMs"]
        # the reference's sub-views (MetricsController.java:89-118)
        st, sub = _req(base, "/metrics/startup")
        assert set(sub) == {
            "imageType", "startupTimeMs", "startupTimeSeconds", "profile",
        }
        st, mem = _req(base, "/metrics/memory")
        assert re.fullmatch(r"\d+\.\d{2}", mem["usedMB"])
        assert re.fullmatch(r"\d+\.\d%", mem["usagePercent"])
    finally:
        srv.close()


def test_rest_state_recovers_from_durable_log(spark, tmp_path):
    """Restart the serve loop over the same change log: the recovered
    state (content via the LWW fold, PK index and the IDENTITY
    high-water mark via bounded metadata recovery) is identical —
    including that a deleted id stays retired."""
    from cdc_cloudrun_demo_spark.serving import MessageServer

    log = str(tmp_path / "log")
    seed = spark.createDataFrame(
        [(10, "a"), (20, "b")], "id long, content string"
    )
    srv = MessageServer(spark, log, seed=seed)
    base = f"http://127.0.0.1:{srv.port}"
    _req(base, "/messages/10", "PUT", {"content": "A2"})
    _req(base, "/messages/20", "DELETE")
    _req(base, "/messages", "POST", {"content": "c"})  # id 21
    before = _req(base, "/messages")[1]
    srv.close()

    srv2 = MessageServer(spark, log, seed=seed)  # re-seed must be ignored
    try:
        base2 = f"http://127.0.0.1:{srv2.port}"
        assert _req(base2, "/messages")[1] == before == [
            {"id": 10, "content": "A2"},
            {"id": 21, "content": "c"},
        ]
        assert _req(base2, "/messages/20")[1] is None
        # IDENTITY high-water mark survived the restart
        assert _req(base2, "/messages", "POST", {"content": "d"})[1][
            "id"
        ] == 22
    finally:
        srv2.close()


def test_threaded_serving_under_concurrent_load(spark, tmp_path):
    """The reference's Cloud Run envelope is concurrent requests per
    container; the serve loop must survive overlapping readers and
    writers: 6 reader threads hammer GET /messages and point lookups
    while two writers mutate DISJOINT id domains (updates on the seed,
    posts+deletes elsewhere). Every response must be a consistent
    snapshot (each returned id carries a complete row), no request may
    error, and the final state must equal the deterministic merge of
    both writers' work — the single-writer mutex serializes state
    transitions while Spark actions overlap."""
    import threading

    from cdc_cloudrun_demo_spark.serving import MessageServer

    seed = spark.createDataFrame(
        [(i, f"seed-{i}") for i in range(1, 11)], "id long, content string"
    )
    srv = MessageServer(spark, str(tmp_path / "log"), seed=seed)
    base = f"http://127.0.0.1:{srv.port}"
    errors: list = []

    def reader():
        try:
            for _ in range(12):
                _st, rows = _req(base, "/messages")
                assert all(
                    set(r) == {"id", "content"} and r["id"] is not None
                    for r in rows
                )
                _req(base, "/messages/3")
        except Exception as e:  # surfaced after join
            errors.append(e)

    def writer_updates():
        try:
            for rnd in range(3):
                for i in range(1, 6):
                    _req(
                        base, f"/messages/{i}", "PUT",
                        {"content": f"u{rnd}-{i}"},
                    )
        except Exception as e:
            errors.append(e)

    def writer_churn():
        try:
            for i in range(6, 11):
                _req(base, f"/messages/{i}", "DELETE")
            for j in range(3):
                _req(base, "/messages", "POST", {"content": f"new-{j}"})
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(6)] + [
        threading.Thread(target=writer_updates),
        threading.Thread(target=writer_churn),
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert not errors, errors
        _st, rows = _req(base, "/messages")
        got = {r["id"]: r["content"] for r in rows}
        want = {i: f"u2-{i}" for i in range(1, 6)}
        want.update({11 + j: f"new-{j}" for j in range(3)})
        assert got == want, got
    finally:
        srv.close()


def test_rest_lww_within_one_buffer(spark, tmp_path):
    """Insert → update → delete → re-insert of one id inside a SINGLE
    un-flushed WAL buffer must fold in request order (the fractional
    seq discipline in `MessageServer.flush`)."""
    from cdc_cloudrun_demo_spark.serving import MessageServer

    srv = MessageServer(spark, str(tmp_path / "log"))
    try:
        base = f"http://127.0.0.1:{srv.port}"
        assert _req(base, "/messages", "POST", {"content": "v1"})[1]["id"] == 1
        _req(base, "/messages/1", "PUT", {"content": "v2"})
        _req(base, "/messages/1", "DELETE")
        assert _req(base, "/messages", "POST", {"content": "v3"})[1]["id"] == 2
        assert _req(base, "/messages")[1] == [{"id": 2, "content": "v3"}]
    finally:
        srv.close()
