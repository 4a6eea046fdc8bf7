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
