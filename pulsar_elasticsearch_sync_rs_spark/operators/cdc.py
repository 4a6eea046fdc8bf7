"""Change-data-capture apply — SCD Type-2 merge as a declarative plan.

The reference syncs an append-only stream into Elasticsearch, where a
re-indexed document simply replaces its predecessor (`src/es.rs` bulk
upsert semantics). An analytics store wants the stronger contract the
warehouse world calls slowly-changing-dimension type 2: every version
of a key is kept with its validity interval, so any historical query
can be answered "as of" a timestamp. This module expresses that merge
with stock DataFrame ops — no table-format dependency, the same
posture as operators/layout.py.

Scale shape (the reason this is an operator and not a MERGE statement):
a CDC batch is orders of magnitude smaller than the base snapshot, so
the plan must never shuffle the base. Here the base is touched by two
BROADCAST joins against per-key reductions of the change batch (first
change ts per key), and the only exchanges are over the changes
themselves (one window, one groupBy — both on the small side). The
base's history rows stream through untouched. At 100 TB this is one
full scan of base + negligible change-side work; pair with
hive-partitioning on a key bucket (operators/layout.py) to rewrite
only the partitions whose keys actually changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    op_col: str = "op",
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply a CDC batch to an SCD2 snapshot, returning the new
    snapshot.

    ``base`` holds one row per (key, version): ``key``, ``attrs``,
    ``from_col``, ``to_col`` (null = open version), ``current_col``.
    ``changes`` holds ``key``, ``attrs``, ``op_col`` in
    ``('I','U','D')`` and ``ts_col``; (key, ts) pairs must be unique
    (pre-aggregate the batch otherwise) and every change ts must be
    ≥ the open version's ``from_col`` — CDC logs are ordered.

    Semantics, per key, changes applied in ``ts_col`` order:
      - the open base version (if any) is closed at the FIRST change's
        ts ('I' on an existing key is upsert, the usual CDC reading);
      - each 'I'/'U' opens a version valid from its ts until the next
        change's ts (open/current if it is the last change);
      - 'D' closes the preceding version and opens nothing;
      - closed base history and untouched keys pass through unchanged.
    """
    kc, tsc = F.col(key), F.col(ts_col)
    nxt = F.lead(ts_col).over(Window.partitionBy(key).orderBy(ts_col))
    opened = (
        changes.withColumn("__next_ts", nxt)
        .filter(F.col(op_col) != "D")
        .select(
            kc,
            *[F.col(a) for a in attrs],
            tsc.alias(from_col),
            F.col("__next_ts").alias(to_col),
            F.col("__next_ts").isNull().alias(current_col),
        )
    )
    # one row per touched key: when its open version stops being open.
    # Broadcast — the change batch is the small side by construction.
    first_ts = F.broadcast(
        changes.groupBy(key).agg(F.min(ts_col).alias("__first_ts"))
    )
    cur = base.filter(F.col(current_col))
    closed_now = (
        cur.join(first_ts, key, "inner")
        .select(
            *[
                F.col("__first_ts").alias(to_col)
                if c == to_col
                else F.lit(False).alias(current_col)
                if c == current_col
                else F.col(c)
                for c in base.columns
            ]
        )
    )
    untouched_cur = cur.join(first_ts, key, "left_anti").select(*base.columns)
    history = base.filter(~F.col(current_col)).select(*base.columns)
    return history.unionByName(untouched_cur).unionByName(closed_now).unionByName(
        opened.select(*base.columns)
    )
