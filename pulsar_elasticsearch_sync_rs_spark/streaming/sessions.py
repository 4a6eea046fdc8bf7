"""Streaming sessionization — native ``session_window`` aggregation
(SURVEY.md §2.9 windows surface, streaming lane).

The batch pack sessionizes with a lag-gap window (`q_sessionize`);
streams can't look back arbitrarily, so Spark's ``session_window``
keeps per-key session state that MERGES as events arrive and closes a
session once the watermark passes its gap — the engine-native form of
the same 30-minute-gap semantics.

Scale: state is (key → open sessions); closed sessions are evicted at
the watermark, so state is bounded by concurrently-open sessions, not
stream history. One shuffle on the session key.

Boundary semantics: a session window is [start, start+gap), so an
event arriving at EXACTLY ``gap`` after the previous one starts a NEW
session, while the batch lag-gap model (strict ``diff > gap``) keeps
it in the same session. The two models agree on every other spacing;
the equality pytest guards that its fixture contains no exact-gap
spacing before asserting multiset equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-user session aggregation over a streaming DataFrame: one
    output row per (user, session) with event count and bounds.
    ``watermark_delay`` trades lateness tolerance for state size."""
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
