"""Streaming deduplication — exact dedup as a STREAMING operator
(SURVEY.md §2.9 dedup surface, in-flight variant).

The batch dedup operators (operators/dedup.py) dedup a corpus at rest;
a 100 TB ingest pipeline also needs dedup-on-arrival (duplicate events
from at-least-once upstream delivery, e.g. the reference's Shared
Pulsar subscription redelivering after reconnect — reference
``src/pulsar.rs:86-94`` retries).

Spark-native: ``dropDuplicatesWithinWatermark`` — state-store-backed
exact dedup whose per-key state is EVICTED once the key's event time
falls behind the watermark, so state is bounded by (arrival rate ×
watermark horizon), not by stream history. Keys are hashes, not
payloads: state stays narrow regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "publish_time",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records (same ``key_cols``) arriving within the
    watermark horizon. First arrival wins; later duplicates are
    discarded; a duplicate arriving after the horizon is admitted
    (state for its key has been evicted) — the documented bound."""
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_by_content(
    df: DataFrame,
    text_col: str = "value",
    ts_col: str = "publish_time",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Content-hash streaming dedup: key the state store on
    sha2(payload) so identical payloads from different topics/offsets
    collapse — the streaming twin of operators.dedup.dedup_exact."""
    hashed = df.withColumn("__content_sha", F.sha2(F.col(text_col), 256))
    return dedup_stream_exact(
        hashed, ["__content_sha"], ts_col=ts_col, watermark_delay=watermark_delay
    ).drop("__content_sha")


def dedup_stream_against_corpus(
    stream: DataFrame,
    corpus_hashes: DataFrame,
    text_col: str = "value",
    sha_col: str = "sha",
    ts_col: str = "publish_time",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Incremental ingest dedup — the STREAMING twin of
    plans/llm_queries.q_dedup_incremental: admit an arriving record only
    if its content hash is (a) absent from the EXISTING corpus and
    (b) the first arrival within the stream's own watermark horizon.

    Shape: a stream-static LEFT ANTI join (Structured Streaming
    supports static right sides on anti joins with no extra state —
    the static side is just a lookup) followed by the state-store
    within-stream dedup. ``corpus_hashes`` is the persisted sha index
    of the corpus at rest — (sha) only, 32 bytes a row; at 100 TB you
    point this at the bucketed hash table the batch dedup already
    maintains, and Spark broadcasts or shuffle-joins it by size. The
    arriving text never shuffles; only its hash does."""
    hashed = stream.withColumn("__content_sha", F.sha2(F.col(text_col), 256))
    fresh = hashed.join(
        corpus_hashes.select(F.col(sha_col).alias("__content_sha")),
        "__content_sha",
        "left_anti",
    )
    return dedup_stream_exact(
        fresh, ["__content_sha"], ts_col=ts_col, watermark_delay=watermark_delay
    ).drop("__content_sha")
