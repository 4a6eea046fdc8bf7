"""Range (interval-containment) join — a custom operator Spark's API
lacks as an equi-join primitive, composed from built-ins the
scale-correct way.

Semantics: point row p matches interval row i iff
``start <= p.ts < end`` (half-open). With no equality key between the
sides, the naive formulation — ``points.join(intervals, containment
predicate)`` — analyzes to a BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts): O(|P|·|I|) comparisons, the
classic scale-killer for time-alignment workloads.

Spark-first implementation (the standard "binning" rewrite used by
interval-join engines): quantize the time axis into fixed-width
buckets, explode each interval onto every bucket it overlaps, map each
point to its single bucket, equi-join on the bucket id, then apply the
exact containment predicate as a residual filter. Because a point
lives in exactly ONE bucket and an interval lists each overlapped
bucket ONCE, every matching pair is emitted exactly once — no
DISTINCT pass needed. The join is a plain hash/sort-merge equi-join:
it shuffles (or broadcasts) on the bucket id and scales with
|P| + Σ⌈len(i)/w⌉, not |P|·|I|.

Choosing ``bucket_width_s`` ~ the typical interval length keeps the
per-interval explode factor ≈ 2 and the per-bucket population small;
a guard fails fast (per-task, via ``assert_true``) if an interval
would fan out past ``max_buckets_per_interval`` rather than silently
exploding a month-long interval into thousands of rows.

Bucket ids are computed with integer ``div`` on ``unix_micros`` —
never float division, which can mis-bucket boundary timestamps.

Reference parity: the reference engine has no interval join; this is
part of the §2.9 extended analytics surface (driver mandate), listed
alongside as-of join in SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_s: int,
    *,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Inner range join: all ``points`` columns + all ``intervals``
    columns for each pair with ``start_ts <= point_ts < end_ts``.

    Column names must be disjoint between the two inputs (rename
    before calling). One equi-join on the quantized bucket id; empty
    intervals (end <= start) match nothing and are dropped before the
    explode (``sequence(a, b)`` would count DOWNWARD for them and
    fabricate wrong buckets).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"point/interval column names must be disjoint; both have {sorted(overlap)}")
    if int(bucket_width_s) <= 0:
        raise ValueError(f"bucket_width_s must be positive, got {bucket_width_s}")
    w_us = int(bucket_width_s) * 1_000_000

    pts = points.withColumn("__p_us", F.unix_micros(F.col(point_ts))).withColumn(
        "__bucket", F.expr(f"__p_us div {w_us}")
    )

    iv = (
        intervals.withColumn("__s_us", F.unix_micros(F.col(start_ts)))
        .withColumn("__e_us", F.unix_micros(F.col(end_ts)))
        .filter(F.col("__e_us") > F.col("__s_us"))
        .withColumn("__b_lo", F.expr(f"__s_us div {w_us}"))
        # end is exclusive: a point at exactly __e_us does not match,
        # so the last overlapped bucket holds __e_us - 1
        .withColumn("__b_hi", F.expr(f"(__e_us - 1) div {w_us}"))
        # the guard is wired INTO the explode input (not a separate
        # dropped column Catalyst would prune away unevaluated)
        .withColumn(
            "__bucket",
            F.explode(
                F.when(
                    F.assert_true(
                        F.col("__b_hi") - F.col("__b_lo") < F.lit(max_buckets_per_interval),
                        F.lit(
                            f"range_join: an interval spans >= {max_buckets_per_interval} "
                            f"buckets of {bucket_width_s}s; raise bucket_width_s"
                        ),
                    ).isNull(),
                    F.sequence(F.col("__b_lo"), F.col("__b_hi")),
                )
            ),
        )
        .drop("__b_lo", "__b_hi")
    )

    joined = pts.join(iv, on="__bucket", how="inner").filter(
        (F.col("__p_us") >= F.col("__s_us")) & (F.col("__p_us") < F.col("__e_us"))
    )
    return joined.select(*points.columns, *intervals.columns)
