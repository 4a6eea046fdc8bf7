"""Skew-resistant aggregation — salting, the standard remedy when one
hot key would pin a single reducer (SURVEY.md §7.4 100 TB posture;
complements AQE's runtime skew-join splitting).

Two-phase: add a deterministic salt derived from a high-cardinality
column, pre-aggregate on (key, salt) — spreading the hot key over
``n_salts`` reducers — then final-aggregate on key. Result identical
to the direct groupBy; cost is one extra (tiny) shuffle of partial
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key: str, salt_from: str, n_salts: int = 16
) -> DataFrame:
    """count(*) per key, hot-key-safe. ``salt_from`` must be a column
    with per-row variation (an id) so the salt is deterministic —
    rand() would break retry/replay determinism."""
    salt = F.pmod(F.crc32(F.col(salt_from).cast("string").cast("binary")), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n_records"))


def salted_sum(
    df: DataFrame, key: str, value_expr, salt_from: str, n_salts: int = 16
) -> DataFrame:
    """sum(value_expr) per key via the same two-phase spread."""
    salt = F.pmod(F.crc32(F.col(salt_from).cast("string").cast("binary")), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value_expr).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("total"))
