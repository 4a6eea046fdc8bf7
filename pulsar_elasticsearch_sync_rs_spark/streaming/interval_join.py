"""Stream-stream interval join — the streaming twin of
``operators/range_join.bucketed_range_join`` (SURVEY.md §2.9 extended
streaming surface).

Joins two live streams where interval rows open a fixed-duration
window ``[start, start + duration)`` and point rows match any open
window containing their event time — alert windows × events,
promo windows × purchases — with NO shared entity key.

Spark's StreamingSymmetricHashJoin wants an equality key to partition
its join state; a pure time-range predicate gives it none. The same
binning rewrite the batch operator uses supplies one: both sides
quantize onto fixed-width time buckets (the interval side explodes
onto the <=2 buckets its window overlaps — a stateless projection,
legal before a stream-stream join), so join STATE is hash-partitioned
by time bucket and each matching pair is emitted exactly once.

The raw event-time range condition stays in the join predicate —
that, plus the watermarks on BOTH sides, is what lets the engine
derive state-eviction bounds: an interval row can be dropped once the
point-side watermark passes ``start + duration``; a point row once
the interval-side watermark passes its timestamp. State is bounded by
the watermark horizon, not stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    duration_s: int,
    watermark_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join of two STREAMING DataFrames: every (interval, point) pair
    with ``start <= point_ts < start + duration_s``. Column names must
    be disjoint. Bucket width = the window duration, so each interval
    lands in at most 2 buckets.

    ``how="left_outer"`` additionally emits each UNMATCHED point with
    null interval columns — but only once the interval-side watermark
    passes the point's timestamp (no earlier-starting interval can
    still arrive), so outer results trail the watermark by design.
    Because a point occupies exactly ONE bucket row, the outer
    null-extension is emitted exactly once.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"point/interval column names must be disjoint; both have {sorted(overlap)}")
    if int(duration_s) <= 0:
        raise ValueError(f"duration_s must be positive, got {duration_s}")
    w_us = int(duration_s) * 1_000_000

    # integer `div` only runs over the materialized internal __*_us
    # columns, never over interpolated user column names (a column
    # name that isn't a bare SQL identifier must not break the expr)
    pts = (
        points.withWatermark(point_ts, watermark_delay)
        .withColumn("__p_us", F.unix_micros(F.col(point_ts)))
        .withColumn("__p_b", F.expr(f"__p_us div {w_us}"))
        .drop("__p_us")
    )
    iv = (
        intervals.withWatermark(start_ts, watermark_delay)
        .withColumn("__s_us", F.unix_micros(F.col(start_ts)))
        # [start, start+dur) overlaps bucket(start) and, unless start is
        # bucket-aligned, bucket(start)+1; end-exclusive, so the last
        # covered microsecond is start + dur - 1
        .withColumn(
            "__i_b",
            F.explode(
                F.sequence(
                    F.expr(f"__s_us div {w_us}"),
                    F.expr(f"(__s_us + {w_us} - 1) div {w_us}"),
                )
            ),
        )
        .drop("__s_us")
    )
    cond = (
        (pts["__p_b"] == iv["__i_b"])
        & (pts[point_ts] >= iv[start_ts])
        & (pts[point_ts] < iv[start_ts] + F.expr(f"INTERVAL {int(duration_s)} SECONDS"))
    )
    return pts.join(iv, cond, how).drop("__p_b", "__i_b")
