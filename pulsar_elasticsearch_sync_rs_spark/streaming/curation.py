"""Streaming end-to-end curation ingestion — the reference's topology
(consume → filter → transform → rate-limit → bulk sink; reference
``src/main.rs:27-77`` wiring ``consume_loop`` →
``sink_elasticsearch_loop``, transform chain ``src/pulsar.rs:227-318``,
buffered bulk sink ``src/es.rs:109-191``, per-app limiter
``src/ratelimiter.rs``) carrying the LLM curation operators instead of
the log-ETL chain: ONE checkpointed ``foreachBatch`` job that gates,
decontaminates, dedups (within-batch AND against everything already
ingested), rate-limits and lands each arriving micro-batch of
documents.

This composes pieces that are individually tested elsewhere —
``functions.text.quality_score`` / ``repetition_signals`` (gate),
``operators.decontaminate`` (bench-gram anti-join with the measured
broadcast guard), the min-id exact-dedup survivor rule of
``plans.llm_queries.q_llm_pipeline``, and the bulk-transport sink of
``streaming/sink.py`` — into the shape a real ingest deployment runs.

Cross-batch dedup state is the ACCUMULATED SHA INDEX: every admitted
batch appends its (sha, doc_id) pairs under ``sha_dir``; the next
batch anti-joins its hashes against that directory. Only 40-byte hash
rows persist and shuffle — arriving text never crosses the wire for
dedup (same posture as ``persist_sha_index``; at 100 TB point
``sha_dir`` at the bucketed corpus index the batch dedup maintains).

Idempotency: checkpointed foreachBatch is at-least-once, so every
write is a per-batch OVERWRITE into ``.../batch=<id>`` — a replayed
micro-batch rewrites identical files instead of duplicating (the same
recipe as the mview/ES crash-replay lanes). The sha index a replayed
batch N reads may already contain batch N's own shas from the first
attempt; the anti-join would then drop ALL its rows, so the index
read explicitly excludes the ``batch=<N>`` slice being rewritten.

Survivor-rule parity with the batch pipeline: within a micro-batch
the survivor is min(doc_id) per sha (deterministic); across batches
it is first-arrival (earlier batch wins). When arrival order is
doc_id-ordered — the replay/backfill case — this equals the batch
``q_llm_pipeline`` min-id rule exactly; under out-of-order arrival it
is the standard streaming first-wins divergence, same as
``dedup_stream_against_corpus``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import quality_score, repetition_signals, word_shingles
from ..operators.decontaminate import (
    DEFAULT_MAX_BROADCAST_GRAMS,
    _guarded,
    bench_gram_set,
)

SHA_INDEX_SCHEMA = "sha string, doc_id long"


def _read_sha_index(spark, sha_dir: str, exclude_batch: int):
    """The accumulated index as of THIS batch: every prior batch's
    slice, minus the slice a replay of ``exclude_batch`` would be
    rewriting. The ``batch=<id>`` directories are read as a PARTITION
    column (FS-agnostic — no driver-side directory walk), so the
    exclusion is a partition filter pruned at planning time and a
    replayed batch never anti-joins against its own first attempt."""
    try:
        idx = spark.read.schema(SHA_INDEX_SCHEMA).parquet(sha_dir)
    except Exception:  # first batch: nothing ingested yet
        return None
    return idx.filter(F.col("batch") != exclude_batch).select("sha")


def run_curation_ingest(
    stream_docs: DataFrame,
    bench: DataFrame,
    out_dir: str,
    sha_dir: str,
    checkpoint_dir: str,
    transport=None,
    n: int = 5,
    quality_min: float = 0.65,
    dup_word_max: float = 0.6,
    top_bigram_max: float = 0.1,
    rate_limits: dict[str, int] | None = None,
    rate_key: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_grams: int = DEFAULT_MAX_BROADCAST_GRAMS,
    available_now: bool = False,
    registry=None,
):
    """Start the curation ingestion stream; returns the StreamingQuery.

    Per micro-batch, in production order:
      1. GATE — quality ≥ ``quality_min`` AND repetition keep
         (dup-word ≤ ``dup_word_max``, top-bigram ≤ ``top_bigram_max``);
         narrow projections, no shuffle.
      2. DECONTAMINATE — drop docs sharing any word ``n``-gram with
         ``bench``. The gram set is built, measured and (under the
         guard threshold) broadcast-hinted ONCE at start — every batch
         pays one hash probe, never the guard's count job.
      3. DEDUP — min-``id_col`` survivor per content sha within the
         batch, then LEFT ANTI against the accumulated sha index.
         Only (sha, id) pairs shuffle.
      4. RATE LIMIT — optional per-``rate_key`` admission cap PER
         MICRO-BATCH (``rate_limits[key]`` rows, lowest ``id_col``
         first — deterministic). Flush-window granularity, same as the
         reference's per-flush buffers (R1 note in ``runner.py``).
      5. LAND — admitted docs overwrite ``out_dir/batch=<id>``; their
         (sha, id) pairs overwrite ``sha_dir/batch=<id>``; and, when a
         bulk ``transport`` is given, the batch is indexed with
         ``index = docs-<lang>`` and the sha as deterministic ``_id``
         (replay-safe; see EsBulkTransport.id_col).

    ``registry`` (optional) gets per-stage counters: curation_input /
    _gated / _contaminated / _duplicate / _rate_dropped / _admitted —
    opt-in because exact stage counts cost one extra pass per stage.
    """
    # replay-safety guard: every write this job makes is a per-batch
    # overwrite, but the TRANSPORT is caller-supplied — an id-less ES
    # transport or an append-mode parquet transport would duplicate
    # every indexed action when a checkpointed restart replays a batch,
    # silently voiding the module's idempotency contract. Refuse the
    # two known-unsafe shapes up front.
    if transport is not None:
        from pulsar_elasticsearch_sync_rs_spark.streaming.sink import (
            ParquetBulkTransport,
        )

        if getattr(transport, "id_col", "absent") is None:
            raise ValueError(
                "run_curation_ingest: EsBulkTransport without id_col would "
                "duplicate documents when a replayed micro-batch re-indexes "
                "(auto-generated _ids) - construct it with id_col='sha'"
            )
        if type(transport) is ParquetBulkTransport:
            raise ValueError(
                "run_curation_ingest: ParquetBulkTransport appends, so a "
                "replayed micro-batch duplicates its rows - use "
                "IdempotentParquetBulkTransport (per-batch overwrite)"
            )

    grams, _ = _guarded(
        bench_gram_set(bench, n, text_col), max_broadcast_grams, keep_cached=True
    )
    counted_batches: set[int] = set()
    _, dup_word_frac, top_bigram_frac = repetition_signals(text_col)
    gate_pred = (
        (quality_score(text_col) >= quality_min)
        & (dup_word_frac <= dup_word_max)
        & (top_bigram_frac <= top_bigram_max)
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts: dict[str, int] = {}
        # counters are incremented once per batch_id: an in-process
        # supervisor restart replays the failed batch through this
        # same closure, and re-counting it would inflate every stage
        # counter and break the input == sum(drop buckets) + admitted
        # tie-out (a cross-process restart starts a fresh registry, so
        # nothing is double-counted there either)
        count_this_batch = registry is not None and batch_id not in counted_batches
        if count_this_batch:
            batch_df = batch_df.persist()
            counts["curation_input"] = batch_df.count()

        gated = batch_df.filter(gate_pred)

        # decontaminate: shingle ONLY gate survivors, anti-join the
        # pre-measured gram set (broadcast probe under the guard)
        hit_ids = (
            gated.select(id_col, F.explode(word_shingles(text_col, n)).alias("g"))
            .join(grams, "g")
            .select(id_col)
            .distinct()
        )
        clean = gated.join(hit_ids, id_col, "left_anti")

        # within-batch min-id survivor per sha — semi-join so text
        # never shuffles on the hash key
        hashed = clean.withColumn("__sha", F.sha2(F.col(text_col), 256))
        surv_ids = (
            hashed.select("__sha", id_col)
            .groupBy("__sha")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        deduped = hashed.join(surv_ids, id_col, "left_semi")

        # cross-batch: anti-join the accumulated index (hashes only)
        prior = _read_sha_index(spark, sha_dir, exclude_batch=batch_id)
        if prior is not None:
            deduped = deduped.join(
                prior.withColumnRenamed("sha", "__sha"), "__sha", "left_anti"
            )

        if rate_limits:
            w = Window.partitionBy(rate_key).orderBy(F.col(id_col).asc())
            cap = F.lit(None).cast("int")
            for k, v in rate_limits.items():
                cap = F.when(F.col(rate_key) == k, F.lit(v)).otherwise(cap)
            admitted = (
                deduped.withColumn("__rn", F.row_number().over(w))
                .withColumn("__cap", cap)
                .filter(F.col("__cap").isNull() | (F.col("__rn") <= F.col("__cap")))
                .drop("__rn", "__cap")
            )
        else:
            admitted = deduped

        # admitted feeds ≥2 writes (+ counters) — persist once
        admitted = admitted.persist()
        try:
            if count_this_batch:
                counts["curation_gated"] = counts["curation_input"] - gated.count()
                n_clean = clean.count()
                counts["curation_contaminated"] = (
                    counts["curation_input"] - counts["curation_gated"] - n_clean
                )
                n_admitted = admitted.count()
                n_deduped = deduped.count() if rate_limits else n_admitted
                counts["curation_duplicate"] = n_clean - n_deduped
                counts["curation_rate_dropped"] = n_deduped - n_admitted
                counts["curation_admitted"] = n_admitted
                for k, v in counts.items():
                    registry.inc(k, v)
                counted_batches.add(batch_id)

            admitted.drop("__sha").write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
            admitted.select(
                F.col("__sha").alias("sha"), F.col(id_col).alias("doc_id")
            ).write.mode("overwrite").parquet(
                os.path.join(sha_dir, f"batch={batch_id}")
            )
            if transport is not None:
                indexed = admitted.select(
                    F.concat(
                        F.lit("docs-"), F.coalesce(F.col("lang"), F.lit("unknown"))
                    ).alias("index"),
                    F.struct(id_col, "lang", "source").alias("doc"),
                    F.col("__sha").alias("sha"),
                )
                transport.write(indexed, batch_id)
        finally:
            admitted.unpersist()
            if count_this_batch:
                batch_df.unpersist()

    writer = stream_docs.writeStream.foreachBatch(ingest_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
