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
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ParquetBulkTransport:
    """Test sink: write each micro-batch to parquet partitioned by the
    routing column — the observable equivalent of per-index bulk
    indexing. APPEND semantics: a replayed micro-batch duplicates its
    rows, mirroring an id-less ES bulk (auto-ids duplicate on retry).
    For a job that may be restarted/replayed, use
    :class:`IdempotentParquetBulkTransport`."""

    path: str
    index_col: str = "index"

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy(self.index_col)
            .parquet(self.path)
        )


@dataclass
class IdempotentParquetBulkTransport:
    """Replay-safe parquet sink: each micro-batch OVERWRITES its own
    ``.../batch=<id>`` slice, so an at-least-once replay rewrites
    identical files instead of appending duplicates — the parquet
    analog of ``EsBulkTransport(id_col=...)``'s overwrite-by-id. Read
    the whole dataset back with one ``spark.read.parquet(path)``
    (``batch`` becomes a partition column)."""

    path: str
    index_col: str = "index"

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        (
            batch_df.write.mode("overwrite")
            .partitionBy(self.index_col)
            .parquet(os.path.join(self.path, f"batch={batch_id}"))
        )


@dataclass
class EsBulkTransport:
    """Real ES bulk transport: each executor partition POSTs its rows
    as ``{"index": {"_index": idx}}\\n{doc}`` NDJSON chunks of
    ``buffer_size`` (reference default 1000, ``src/args.rs:105-107``).

    K1 parity — per-item error accounting: Elasticsearch returns HTTP
    200 with ``"errors": true`` when individual items were rejected;
    the reference walks the response items and splits success/failure
    counts per index (reference ``src/es.rs:155-188``, counters
    ``src/prometheus.rs:35-126``). Here each executor partition parses
    its bulk responses and ships back ONE tiny (index, ok, failed)
    summary per index — aggregated driver-side into ``registry`` as
    ``es_write_success`` / ``es_write_failure`` labeled by index.

    ``strict=True`` raises on any item failure so the checkpointed
    foreachBatch retries the micro-batch (at-least-once); the default
    mirrors the reference (count and continue).

    ``id_col`` (opt-in): use a row column as the document ``_id``. The
    reference sends id-less actions so ES auto-generates ids and any
    retry duplicates (``src/es.rs:364,372``; SURVEY.md §1.4). With a
    deterministic id (e.g. the injected UUID or a content sha), replays
    of a retried micro-batch overwrite instead of duplicating —
    at-least-once delivery becomes effectively-once in the index. Kept
    off by default for reference parity."""

    es_url: str
    index_col: str = "index"
    doc_col: str = "doc"
    buffer_size: int = 1000
    registry: object | None = None  # MetricsRegistry, driver-side only
    strict: bool = False
    id_col: str | None = None
    last_stats: dict = field(default_factory=dict, compare=False)

    def write(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        es_url, buffer_size = self.es_url, self.buffer_size

        # NDJSON action+doc lines are built JVM-side (to_json/concat run
        # in whole-stage codegen): the reference serializes in-process
        # (src/es.rs:129-191) and the previous json.dumps-per-row here
        # crossed JVM->Python row-at-a-time — the measured throughput
        # ceiling of the sink. Python below only joins lines and POSTs.
        meta = [F.col(self.index_col).alias("_index")]
        if self.id_col is not None:
            meta.append(F.col(self.id_col).cast("string").alias("_id"))
        action = F.to_json(F.struct(F.struct(*meta).alias("index")))
        doc = F.coalesce(F.to_json(F.col(self.doc_col)), F.lit("{}"))
        payload = batch_df.select(
            F.col(self.index_col).alias("__idx"),
            F.concat(action, F.lit("\n"), doc).alias("__line"),
        )

        def send_partition(rows):
            import urllib.request
            from collections import Counter

            ok: Counter = Counter()
            failed: Counter = Counter()
            buf: list[str] = []
            idxs: list[str] = []  # target index of each buffered action

            def flush():
                if not buf:
                    return
                body = "\n".join(buf) + "\n"
                req = urllib.request.Request(
                    f"{es_url}/_bulk",
                    data=body.encode(),
                    headers={"Content-Type": "application/x-ndjson"},
                )
                raw = urllib.request.urlopen(req, timeout=30).read()
                try:
                    resp = json.loads(raw) if raw else {}
                except ValueError:
                    resp = {"errors": True, "items": []}
                if not resp.get("errors"):
                    for idx in idxs:
                        ok[idx] += 1
                else:
                    # items are positionally parallel to the actions sent
                    items = resp.get("items") or []
                    for pos, idx in enumerate(idxs):
                        op = items[pos].get("index", {}) if pos < len(items) else {}
                        status = op.get("status", 599)
                        if op.get("error") is not None or int(status) >= 300:
                            failed[idx] += 1
                        else:
                            ok[idx] += 1
                buf.clear()
                idxs.clear()

            for row in rows:
                buf.append(row[1])  # pre-serialized "action\ndoc" pair
                idxs.append(row[0])
                if len(idxs) >= buffer_size:
                    flush()
            flush()
            for idx in set(ok) | set(failed):
                yield (idx, ok[idx], failed[idx])

        # mapPartitions (not foreachPartition) so each partition returns
        # its tiny per-index tally; the collect is O(partitions × indexes)
        # rows of three scalars — not a data-path collect.
        tallies = payload.rdd.mapPartitions(send_partition).collect()
        stats: dict[str, list[int]] = {}
        for idx, n_ok, n_failed in tallies:
            s = stats.setdefault(idx, [0, 0])
            s[0] += n_ok
            s[1] += n_failed
        self.last_stats = stats
        n_failed_total = sum(f for _, f in stats.values())
        if self.strict and n_failed_total:
            # raise BEFORE touching the registry: foreachBatch will retry
            # this micro-batch, and counters already folded in would be
            # incremented again on the replay, inflating es_write_success
            # for the items that were accepted the first time
            raise RuntimeError(
                f"bulk batch {batch_id}: {n_failed_total} item(s) rejected by ES"
            )
        if self.registry is not None:
            for idx, (n_ok, n_failed) in stats.items():
                if n_ok:
                    self.registry.inc("es_write_success", n_ok, index=idx)
                if n_failed:
                    self.registry.inc("es_write_failure", n_failed, index=idx)


def bulk_sink_foreach_batch(transport):
    """Adapter: transport -> foreachBatch callable."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        transport.write(batch_df, batch_id)

    return fn
