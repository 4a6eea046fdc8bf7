"""R1 — per-app keyed rate limiter, drop on exceed (SURVEY.md §2.5).

The reference uses a GCRA token-bucket keyed by app: records for apps
over their configured N/s are dropped, other apps are unaffected, and
unconfigured apps are unlimited (reference ``src/ratelimiter.rs:96-129``,
applied ``src/es.rs:359-373``). The observable batch contract we pin
(SURVEY.md §7.4): **keep at most N records per app per wall-clock
second, drop the rest, deterministically by arrival order**.

Spark-first design:
- deterministic batch operator: ``row_number() OVER (PARTITION BY app,
  second ORDER BY ts, tiebreaker) <= N`` — one shuffle on
  ``(app, second)``, which at 100 TB is well-distributed because the
  second bucket rotates; a single hot app does NOT hot-spot a single
  reducer the way ``PARTITION BY app`` alone would.
- streaming variant: per-micro-batch application of the same window
  (see ``streaming/rate_limit_state.py`` for the stateful
  ``applyInPandasWithState`` carry-across-batches variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate_limit_per_second(
    df: DataFrame,
    limits: dict[str, int],
    app: str = "app",
    ts: str = "ts",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Keep ≤ limits[app] records per (app, second); apps without a
    configured limit pass through untouched.

    ``tiebreaker`` makes the kept set deterministic when timestamps
    collide (fixtures use ``event_id``).
    """
    if not limits:
        return df
    second = F.date_trunc("second", F.col(ts))
    order = [F.col(ts).asc()]
    if tiebreaker:
        order.append(F.col(tiebreaker).asc())
    w = Window.partitionBy(F.col(app), second).orderBy(*order)

    # limit lookup as a literal CASE chain — bounded config, no join
    limit_expr = F.lit(None).cast("int")
    for a, n in limits.items():
        limit_expr = F.when(F.col(app) == a, F.lit(n)).otherwise(limit_expr)

    return (
        df.withColumn("__rl_limit", limit_expr)
        .withColumn(
            "__rl_rn",
            F.when(F.col("__rl_limit").isNotNull(), F.row_number().over(w)),
        )
        .filter(F.col("__rl_limit").isNull() | (F.col("__rl_rn") <= F.col("__rl_limit")))
        .drop("__rl_limit", "__rl_rn")
    )
