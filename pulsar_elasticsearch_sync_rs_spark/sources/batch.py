"""Batch readers over the fixture tables, plus the mapping from the
``events`` fixture to the reference's stream-record shape.

The reference's source row is (payload, topic, publish_time)
(reference ``src/pulsar.rs:32-44,60-69``; ``src/util.rs:26-57``). The
``events`` fixture stands in for the Pulsar stream (FIXTURES.md):
``props`` ≈ raw JSON payload, ``event_type`` ≈ topic routing key,
``ts`` ≈ publish_time, ``user_id`` ≈ rate-limit key.

Column pruning + predicate pushdown reach the parquet scan because
these are plain ``spark.read.parquet`` relations — check with
``.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TENANT_NS = "persistent://public/default"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The fixture's ts encoding has varied across driver testdata
        # generations: TIMESTAMP(NANOS) read as long (nanosAsLong), or
        # timestamp[us] with isAdjustedToUTC=false read as TIMESTAMP_NTZ.
        # Normalize every shape to a session-TZ (UTC) TIMESTAMP so strict
        # consumers (unix_millis, window ranges) see one type and values
        # render identically to DuckDB's naive-timestamp reading.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integral `div`, NOT `/`: ns values (~1.7e18) exceed double's
            # 53-bit mantissa, so float division rounds at the µs level
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # session TZ is pinned UTC, so this preserves the wall clock
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_as_stream_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> the reference's record shape:
    ``value`` (raw payload), ``topic`` (full Pulsar URI), ``publish_time``
    plus passthrough keys used by downstream operators."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("props").alias("value"),
        F.concat(F.lit(TENANT_NS + "/"), F.col("event_type")).alias("topic"),
        F.col("ts").alias("publish_time"),
        F.col("user_id"),
        F.col("value").alias("metric_value"),
    )
