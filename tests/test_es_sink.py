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
