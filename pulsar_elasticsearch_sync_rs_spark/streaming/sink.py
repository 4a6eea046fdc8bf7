"""Bulk sink (K1/G1/G2 of SURVEY.md §2.4/§2.6) — the Spark-native
replacement for the reference's Elasticsearch ``_bulk`` writer
(reference ``src/es.rs:109-191``).

Design: ``foreachBatch`` receives each micro-batch (the flush unit —
G2's hybrid count/time policy maps to trigger interval + source
admission limits), groups by the dynamic ``index`` routing column
(G1's BufferMap), and hands every (index → rows) group to a pluggable
bulk transport:

- ``ParquetBulkTransport`` — the test/verification sink: one parquet
  dataset partitioned by index (file layout ≡ index routing).
- ``EsBulkTransport`` — real Elasticsearch ``_bulk`` over HTTP from
  each executor partition (no driver funnel, no collect); gated behind
  an import-try since no ES is present in this environment. Unlike the
  reference (ack-before-write, at-most-once, no retry —
  ``src/pulsar.rs:227-232``, ``src/es.rs:165``), checkpointed
  foreachBatch gives at-least-once; documents carry no _id, matching
  the reference's auto-id behavior.

Scale: the partitionBy write shuffles nothing (dynamic partition write
is a per-task file split); ES transport batches `buffer_size` docs per
bulk call per partition, which is exactly the reference's buffering
but parallel per executor.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ParquetBulkTransport:
    """Test sink: write each micro-batch to parquet partitioned by the
    routing column — the observable equivalent of per-index bulk
    indexing."""

    path: str
    index_col: str = "index"

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy(self.index_col)
            .parquet(self.path)
        )


@dataclass
class EsBulkTransport:
    """Real ES bulk transport: each executor partition POSTs its rows
    as ``{"index": {"_index": idx}}\\n{doc}`` NDJSON chunks of
    ``buffer_size`` (reference default 1000, ``src/args.rs:105-107``).
    Import-gated: requires ``urllib3``/network, absent here."""

    es_url: str
    index_col: str = "index"
    doc_col: str = "doc"
    buffer_size: int = 1000

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        es_url, index_col, doc_col, buffer_size = (
            self.es_url,
            self.index_col,
            self.doc_col,
            self.buffer_size,
        )

        def send_partition(rows):
            import urllib.request

            buf: list[str] = []

            def flush(buf: list[str]):
                if not buf:
                    return
                body = "\n".join(buf) + "\n"
                req = urllib.request.Request(
                    f"{es_url}/_bulk",
                    data=body.encode(),
                    headers={"Content-Type": "application/x-ndjson"},
                )
                urllib.request.urlopen(req, timeout=30).read()
                buf.clear()

            for row in rows:
                action = json.dumps({"index": {"_index": row[index_col]}})
                doc = json.dumps(dict(row[doc_col]) if row[doc_col] else {})
                buf.extend([action, doc])
                if len(buf) >= 2 * buffer_size:
                    flush(buf)
            flush(buf)

        batch_df.foreachPartition(send_partition)


def bulk_sink_foreach_batch(transport):
    """Adapter: transport -> foreachBatch callable."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        transport.write(batch_df, batch_id)

    return fn
