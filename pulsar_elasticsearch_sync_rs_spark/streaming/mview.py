"""Streaming materialized-view maintenance — keep a queryable
aggregate table continuously up to date from a stream, without a
lakehouse format's MERGE.

The reference engine has nothing like this (its only sink is the ES
bulk index); it belongs to the §2.9 extended streaming surface: the
canonical production pattern for serving per-key running aggregates
(user totals, per-app counters) where downstream readers want a plain
parquet table, not the engine's internal state store.

Design (``foreachBatch`` + merge-by-union):

1. each micro-batch partial-aggregates itself (map-side combine —
   only (key, partial) rows leave the batch);
2. merge = read current state ⟶ unionByName ⟶ groupBy(key) ⟶ sum.
   Works for any SUM-MERGEABLE aggregate (count, sum; avg carried as
   sum+count) — the same mergeability contract as the CMS cells;
3. write to a versioned subdirectory then atomically repoint a
   ``_CURRENT`` marker file — readers always see a complete table;
4. EXACTLY-ONCE across restarts: the applied ``batch_id`` is stored
   in the marker. Structured Streaming replays the last micro-batch
   after a crash; a replayed (already-applied) batch id is skipped,
   so re-delivery cannot double-count. This is the standard
   idempotent-foreachBatch recipe.

Scale: the merge shuffles (key, partials) only — the corpus of raw
events never re-reads; state size is the key cardinality. At very
large key counts, persist the state bucketed by key (see
``operators/dedup`` sha-index precedent) so the merge groupBy
co-locates without an extra exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _current_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_CURRENT")


def read_view(spark, state_dir: str) -> DataFrame | None:
    """The current state of the view, or None before the first batch."""
    marker = _current_path(state_dir)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="utf-8") as fh:
        version, _batch_id = fh.read().split()
    return spark.read.parquet(os.path.join(state_dir, version))


def _applied_batch_id(state_dir: str) -> int:
    marker = _current_path(state_dir)
    if not os.path.exists(marker):
        return -1
    with open(marker, encoding="utf-8") as fh:
        _version, batch_id = fh.read().split()
    return int(batch_id)


def maintain_count_sum_view(
    stream: DataFrame,
    key_cols: list[str],
    sum_col: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Maintain ``groupBy(key_cols).agg(count(*), sum(sum_col))`` over
    the whole stream history as a parquet table under ``state_dir``.
    Returns the StreamingQuery. Restart-safe: replayed micro-batches
    are skipped by batch id, so counts never double."""
    spark = stream.sparkSession
    os.makedirs(state_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _applied_batch_id(state_dir):
            return  # replayed after restart; already folded in
        partial = batch_df.groupBy(*key_cols).agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col(sum_col).cast("decimal(18,4)")).alias("sum_value"),
        )
        current = read_view(spark, state_dir)
        merged = (
            partial
            if current is None
            else current.unionByName(partial)
            .groupBy(*key_cols)
            .agg(F.sum("n_rows").alias("n_rows"), F.sum("sum_value").alias("sum_value"))
        )
        version = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(state_dir, version))
        tmp = _current_path(state_dir) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"{version} {batch_id}")
        os.replace(tmp, _current_path(state_dir))  # atomic repoint

    writer = stream.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
