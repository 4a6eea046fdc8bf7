"""K1 — EsBulkTransport exercised against an in-process HTTP server
that captures ``_bulk`` requests (no real Elasticsearch in this
environment; the transport's NDJSON protocol + chunking is what's
under test)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import Row

from pulsar_elasticsearch_sync_rs_spark.streaming.sink import EsBulkTransport

captured: list[bytes] = []


class _BulkCapture(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        captured.append(self.rfile.read(n))
        body = b'{"took": 1, "errors": false, "items": []}'
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


class _BulkReject(BaseHTTPRequestHandler):
    """Accepts every doc except ones whose target index contains
    'reject' — those come back as per-item mapper failures inside an
    HTTP 200 (the partial-failure shape the reference accounts for,
    reference src/es.rs:155-188)."""

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        payload = self.rfile.read(n)
        captured.append(payload)
        actions = [
            json.loads(line)
            for line in payload.decode().strip().split("\n")[::2]  # action lines
        ]
        items = []
        any_err = False
        for a in actions:
            idx = a["index"]["_index"]
            if "reject" in idx:
                any_err = True
                items.append(
                    {"index": {"_index": idx, "status": 400,
                               "error": {"type": "mapper_parsing_exception"}}}
                )
            else:
                items.append({"index": {"_index": idx, "status": 201}})
        body = json.dumps({"took": 1, "errors": any_err, "items": items}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


def test_es_bulk_transport(spark):
    captured.clear()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _BulkCapture)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        rows = [
            Row(index="app-2024.01.01", doc={"msg": "a"}),
            Row(index="app-2024.01.01", doc={"msg": "b"}),
            Row(index="web-2024.01.02", doc={"msg": "c"}),
        ]
        df = spark.createDataFrame(rows).coalesce(1)
        EsBulkTransport(es_url=url, buffer_size=2).write(df, batch_id=0)

        assert captured, "no bulk request received"
        lines = [
            json.loads(line)
            for payload in captured
            for line in payload.decode().strip().split("\n")
        ]
        actions = [l for l in lines if "index" in l and "_index" in l.get("index", {})]
        docs = [l for l in lines if "msg" in l]
        assert len(actions) == 3 and len(docs) == 3
        assert {a["index"]["_index"] for a in actions} == {
            "app-2024.01.01",
            "web-2024.01.02",
        }
        assert all("_id" not in a["index"] for a in actions)  # auto-id parity
        # buffer_size=2 → first request carries 2 docs, second carries 1
        assert len(captured) == 2
    finally:
        server.shutdown()
        server.server_close()


def test_es_bulk_deterministic_id(spark):
    """Opt-in deterministic _id: actions carry _id so a retried
    micro-batch overwrites instead of duplicating (effectively-once);
    default stays id-less (reference auto-id parity, src/es.rs:364)."""
    captured.clear()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _BulkCapture)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        rows = [
            Row(index="app-2024.01.01", rid="r1", doc={"msg": "a"}),
            Row(index="app-2024.01.01", rid="r2", doc={"msg": "b"}),
        ]
        df = spark.createDataFrame(rows).coalesce(1)
        EsBulkTransport(es_url=url, buffer_size=10, id_col="rid").write(df, batch_id=0)
        actions = [
            json.loads(line)
            for payload in captured
            for line in payload.decode().strip().split("\n")[::2]
        ]
        assert {a["index"]["_id"] for a in actions} == {"r1", "r2"}
    finally:
        server.shutdown()
        server.server_close()


def test_es_bulk_error_accounting(spark):
    """K1 parity: a partially-failed _bulk (HTTP 200 + errors:true)
    must split es_write_success / es_write_failure per index in the
    registry, and strict mode must raise (foreachBatch retry path)."""
    import pytest

    from pulsar_elasticsearch_sync_rs_spark.streaming.metrics import MetricsRegistry

    captured.clear()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _BulkReject)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        rows = [
            Row(index="app-2024.01.01", doc={"msg": "a"}),
            Row(index="reject-2024.01.01", doc={"msg": "bad1"}),
            Row(index="app-2024.01.01", doc={"msg": "b"}),
            Row(index="reject-2024.01.01", doc={"msg": "bad2"}),
            Row(index="web-2024.01.02", doc={"msg": "c"}),
        ]
        df = spark.createDataFrame(rows).coalesce(2)
        registry = MetricsRegistry()
        transport = EsBulkTransport(es_url=url, buffer_size=2, registry=registry)
        transport.write(df, batch_id=7)

        assert registry.get("es_write_success", index="app-2024.01.01") == 2
        assert registry.get("es_write_success", index="web-2024.01.02") == 1
        assert registry.get("es_write_failure", index="reject-2024.01.01") == 2
        assert registry.get("es_write_failure", index="app-2024.01.01") == 0
        assert transport.last_stats["reject-2024.01.01"] == [0, 2]

        strict = EsBulkTransport(es_url=url, buffer_size=2, strict=True)
        with pytest.raises(RuntimeError, match="rejected"):
            strict.write(df, batch_id=8)
    finally:
        server.shutdown()
        server.server_close()


class _FlakyBulk(BaseHTTPRequestHandler):
    """Fails the FIRST bulk request (HTTP 200 + per-item 503s — the
    transient-overload shape), accepts everything after. Successful
    actions land in ``es_state`` keyed by _id, modeling ES index
    semantics: same _id ⇒ overwrite, not duplicate."""

    fail_first = [True]  # shared mutable flag
    es_state: dict = {}

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        payload = self.rfile.read(n)
        captured.append(payload)
        lines = payload.decode().strip().split("\n")
        actions = [json.loads(l) for l in lines[::2]]
        docs = lines[1::2]
        if self.fail_first[0]:
            self.fail_first[0] = False
            items = [
                {"index": {"_index": a["index"]["_index"], "status": 503,
                           "error": {"type": "es_rejected_execution_exception"}}}
                for a in actions
            ]
            body = json.dumps({"took": 1, "errors": True, "items": items}).encode()
        else:
            items = []
            for a, d in zip(actions, docs):
                self.es_state[a["index"]["_id"]] = d
                items.append({"index": {"_index": a["index"]["_index"], "status": 201}})
            body = json.dumps({"took": 1, "errors": False, "items": items}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


def test_es_sink_crash_replay_effectively_once(spark, tmpdir):
    """The effectively-once claim, end-to-end: a checkpointed streaming
    query whose first micro-batch attempt is rejected by ES (strict
    mode raises → the query DIES mid-batch, registry untouched), then a
    RESTART from the same checkpoint replays the same batch_id. Pinned:
    (1) zero duplicate docs — deterministic _id means the replay
    overwrites, the modeled index holds exactly one doc per row;
    (2) no counter inflation — es_write_success counts each doc exactly
    once because the strict raise happens BEFORE the registry fold."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import StreamingQueryException

    from pulsar_elasticsearch_sync_rs_spark.streaming.metrics import MetricsRegistry
    from pulsar_elasticsearch_sync_rs_spark.streaming.sink import bulk_sink_foreach_batch

    captured.clear()
    _FlakyBulk.fail_first[0] = True
    _FlakyBulk.es_state = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyBulk)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        src_dir = os.path.join(tmpdir, "src")
        rows = [Row(rid=f"r{i}", index="app-2024.01.01", msg=f"m{i}") for i in range(20)]
        spark.createDataFrame(rows).coalesce(1).write.parquet(src_dir)

        registry = MetricsRegistry()
        transport_kwargs = dict(
            es_url=url, buffer_size=1000, strict=True, id_col="rid", registry=registry
        )
        from pulsar_elasticsearch_sync_rs_spark.streaming.sink import EsBulkTransport

        transport = EsBulkTransport(**transport_kwargs)
        ckpt = os.path.join(tmpdir, "ckpt_es")

        def run():
            stream = (
                spark.readStream.schema("rid string, index string, msg string")
                .parquet(src_dir)
                .withColumn("doc", F.struct(F.col("msg")))
                .select("rid", "index", "doc")
                .coalesce(1)
            )
            return (
                stream.writeStream.foreachBatch(bulk_sink_foreach_batch(transport))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        # attempt 1: ES rejects → strict raise kills the query mid-batch
        q = run()
        with pytest.raises(StreamingQueryException, match="rejected"):
            q.awaitTermination()
        assert registry.get("es_write_success", index="app-2024.01.01") == 0, (
            "counters must not fold for a failed attempt"
        )
        assert not _FlakyBulk.es_state, "rejected attempt must index nothing"

        # restart: same checkpoint replays the SAME batch_id; server now accepts
        q = run()
        q.awaitTermination()

        # zero duplicates: one doc per source row, ids exactly r0..r19
        assert set(_FlakyBulk.es_state) == {f"r{i}" for i in range(20)}
        # the replay carried the same deterministic _ids as the failed
        # attempt — byte-identical action streams across both attempts
        first, second = captured[0], captured[-1]
        ids = lambda p: [json.loads(l)["index"]["_id"] for l in p.decode().strip().split("\n")[::2]]
        assert ids(first) == ids(second)
        # no inflation: each doc counted exactly once across both attempts
        assert registry.get("es_write_success", index="app-2024.01.01") == 20
        assert registry.get("es_write_failure", index="app-2024.01.01") == 0
    finally:
        server.shutdown()
        server.server_close()
