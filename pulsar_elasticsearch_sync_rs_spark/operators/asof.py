"""As-of (most-recent-prior) join — a custom operator Spark's API
lacks as a primitive, composed from built-ins the scale-correct way.

Semantics: for each left row (key, ts), attach the right row with the
greatest right_ts ≤ ts for the same key (ties broken by a unique right
tiebreaker, latest wins). The naive formulation — inequality join then
per-left-row rank — multiplies rows by the match count before pruning.

Spark-first implementation (single shuffle, no row multiplication):
union the two sides tagged, sort within key by (ts, side-order), and
carry the last-seen right payload forward with ``last(..., ignorenulls)``
over an unbounded-preceding window. Each row is touched once; state is
one payload struct per partition stream. This is the standard
log-merge formulation of as-of joins on shuffle engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join. Output: all left columns + ``payload_cols``
    from the matched right row (NULLs when no prior right row).

    One shuffle on ``key``; sorted-merge within partitions via window.
    """
    order_cols = [F.col("__ts").asc(), F.col("__side").asc()]
    if right_tiebreaker:
        # later right rows win ties: ascending tiebreaker, last() picks max
        order_cols.append(F.col("__tie").asc_nulls_first())

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right (0) sorts before left (1) at equal ts
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols)
            + ">"
        )
        .alias("__payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_tiebreaker).cast("long") if right_tiebreaker else F.lit(0).cast("long")).alias(
            "__tie"
        ),
        F.lit(None).cast(l_tagged.schema["__left"].dataType.simpleString()).alias("__left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        "__left.*", *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in payload_cols]
    )
    return out
