"""G3 as a first-class streaming aggregation: per-(topic, window)
consumed/debug counters with event-time windows + watermark.

The reference's counters are processing-time monotonic increments
(reference ``src/prometheus.rs:7-126``); the Spark-native upgrade is an
event-time windowed count with late-data handling — the standard
Structured Streaming pattern (watermark bounds state; append mode emits
each window once it is final). This is the "counter stream" a
Prometheus scraper or downstream table would consume at cluster scale:
state is (topic × window) — bounded and tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counters(
    records: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    topic: str = "topic_short",
    ts: str = "publish_time",
    is_debug: str = "is_debug",
) -> DataFrame:
    """(topic, window) -> consumed / consumed_debug counts.

    Works on both batch and streaming DataFrames (same plan; streaming
    adds watermark state management). Output columns: topic,
    window_start, window_end, consumed, consumed_debug.
    """
    if records.isStreaming:
        records = records.withWatermark(ts, watermark_delay)
    win = F.window(F.col(ts), window_duration)
    return (
        records.groupBy(F.col(topic).alias("topic"), win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("consumed"),
            F.sum(F.when(F.col(is_debug), 1).otherwise(0)).alias("consumed_debug"),
        )
        .select(
            "topic",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "consumed",
            "consumed_debug",
        )
    )
