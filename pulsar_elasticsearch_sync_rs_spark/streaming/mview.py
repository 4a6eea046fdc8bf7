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
   only the newest ``keep_versions`` snapshots are retained (a grace
   window for in-flight readers), so disk stays O(keep_versions ·
   state size) instead of growing with stream lifetime;
4. EXACTLY-ONCE across restarts: the applied ``batch_id`` is stored
   in the marker. Structured Streaming replays the last micro-batch
   after a crash; a replay of EXACTLY the applied batch id is
   skipped, so re-delivery cannot double-count. A batch id BELOW the
   applied one means the checkpoint was deleted or repointed while
   the state survived — silently skipping or merging would corrupt
   the totals, so that raises instead (rebuild the view or restore
   the matching checkpoint).

Scale: the merge shuffles (key, partials) only — the corpus of raw
events never re-reads; state size is the key cardinality. At very
large key counts, persist the state bucketed by key (see
``operators/dedup`` sha-index precedent) so the merge groupBy
co-locates without an extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _read_marker(state_dir: str) -> tuple[str, int] | None:
    """(version, applied_batch_id) from the marker, or None before the
    first batch — the ONE reader both the skip decision and the state
    read go through. Scheme-aware via layout_io (round 15): the
    versioned-snapshot envelope works on hdfs://s3a:// state dirs,
    not just local disk."""
    from ..operators import layout_io

    text = layout_io.read_text(layout_io.join(state_dir, "_CURRENT"))
    if text is None:
        return None
    version, batch_id = text.split()
    return version, int(batch_id)


def read_view(spark, state_dir: str) -> DataFrame | None:
    """The current state of the view, or None before the first batch."""
    from ..operators import layout_io

    marker = _read_marker(state_dir)
    if marker is None:
        return None
    return spark.read.parquet(layout_io.join(state_dir, marker[0]))


def maintain_count_sum_view(
    stream: DataFrame,
    key_cols: list[str],
    sum_col: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    keep_versions: int = 3,
):
    """Maintain ``groupBy(key_cols).agg(count(*), sum(sum_col))`` over
    the whole stream history as a parquet table under ``state_dir``.
    Returns the StreamingQuery. Restart-safe: the replayed micro-batch
    is skipped by batch id, so counts never double; a checkpoint/state
    mismatch (batch id regression) fails fast instead of corrupting."""
    if keep_versions < 1:
        # lst[:-0] == [] would silently retain EVERY version — the
        # caller asking for aggressive cleanup would get unbounded disk
        raise ValueError(
            f"keep_versions must be >= 1 (the live version itself), got {keep_versions}"
        )
    from ..operators import layout_io

    spark = stream.sparkSession
    layout_io.makedirs(state_dir)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        marker = _read_marker(state_dir)
        applied = marker[1] if marker else -1
        if batch_id == applied:
            return  # the one replayed batch after a crash; already folded in
        if batch_id < applied:
            raise RuntimeError(
                f"materialized view at {state_dir} has applied batch {applied} "
                f"but the stream delivered batch {batch_id}: the checkpoint was "
                "deleted or repointed while the state survived — rebuild the "
                "view or restore the matching checkpoint"
            )
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
        merged.write.mode("overwrite").parquet(
            layout_io.join(state_dir, version)
        )
        # atomic repoint (os.replace locally; FileContext
        # rename(OVERWRITE) on Hadoop paths)
        layout_io.write_text_atomic(
            state_dir, "_CURRENT", f"{version} {batch_id}"
        )
        # retention: keep the newest ``keep_versions`` versions — a
        # grace window for external readers whose lazily-evaluated
        # read_view() DataFrame may span several commits (a reader
        # pinned to an older version than that window is reading a
        # stale snapshot anyway and should re-resolve the marker)
        versions = sorted(
            (e for e in layout_io.list_names(state_dir) if e.startswith("v")),
            key=lambda e: int(e[1:]),
        )
        for entry in versions[:-keep_versions]:
            try:
                layout_io.rmtree(layout_io.join(state_dir, entry))
            except OSError:
                pass  # a racing reader's FS may briefly pin the dir

    writer = stream.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
