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


def scd2_apply_partitioned(
    spark,
    base_dir: str,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    n_parts: int = 16,
    op_col: str = "op",
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> dict:
    """The at-rest form of :func:`scd2_apply`: the snapshot lives as
    parquet hive-partitioned on ``pb = pmod(xxhash64(key), n_parts)``
    (write it once with :func:`persist_scd2_partitioned`), and a CDC
    batch rewrites ONLY the partitions whose keys actually changed —
    the copy-on-write MERGE discipline of lakehouse table formats,
    with stock writers.

    Plan shape: the changed-bucket set (≤ ``n_parts`` ints) comes off
    the change batch; the base read carries ``pb IN (…)`` — a
    PARTITION filter, so unchanged directories are never listed or
    scanned (plan-pinned in tests/test_cdc.py). The merged subset is
    eagerly localCheckpoint'ed BEFORE the overwrite: the write replaces
    the same directories the merge plan reads, the FileNotFound race
    this module's streaming sibling documents. The checkpoint is
    bounded by the changed partitions' size — the quantity a
    partitioned merge exists to keep small. The write uses the
    PER-WRITER dynamic partitionOverwriteMode option (honored on
    path-based writes, unlike the catalog insert route), so only the
    partitions present in the merged subset are replaced and no
    session conf is flipped.

    Returns ``{"changed_buckets", "rows_written"}``.

    Key hashing note: ``xxhash64`` is TYPE-sensitive
    (``xxhash64(5::int) != xxhash64(5::bigint)``), so the change
    batch's key is cast to the PERSISTED base's key dtype before the
    bucket set is derived — a dtype drift between a producer's batch
    and the at-rest snapshot would otherwise rewrite the wrong
    partitions and leave a key with two open versions.
    """
    # schema read is footer-only (no data scan); the base key dtype is
    # the canonical one — pb on disk was computed from it
    base_key_type = {
        f.name: f.dataType for f in spark.read.parquet(base_dir).schema
    }[key]
    changes = changes.withColumn(key, F.col(key).cast(base_key_type))
    pb = F.pmod(F.xxhash64(F.col(key)), F.lit(n_parts)).cast("int")
    buckets = [
        r["pb"] for r in changes.select(pb.alias("pb")).distinct().collect()
    ]
    if not buckets:
        return {"changed_buckets": [], "rows_written": 0}
    base = spark.read.parquet(base_dir).filter(F.col("pb").isin(buckets))
    cols = [key, *attrs, from_col, to_col, current_col]
    merged = scd2_apply(
        base.select(*cols),
        changes,
        key,
        attrs,
        op_col=op_col,
        ts_col=ts_col,
        from_col=from_col,
        to_col=to_col,
        current_col=current_col,
    ).withColumn("pb", pb)
    merged = merged.localCheckpoint(eager=True)
    n = merged.count()
    (
        merged.repartition("pb")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pb")
        .parquet(base_dir)
    )
    return {"changed_buckets": sorted(buckets), "rows_written": n}


def scd2_as_of(
    snapshot: DataFrame,
    ts,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Time travel over an SCD2 snapshot: the rows valid AS OF ``ts`` —
    ``valid_from <= ts < valid_to`` with a NULL ``valid_to`` meaning
    still-open. Exactly one row per key that existed at ``ts`` (the
    apply contract guarantees per-key intervals partition the key's
    lifetime), zero rows for keys born later or deleted before.

    This is the query the validity intervals exist to answer — the
    reference's ES upsert (src/es.rs bulk index) keeps only the newest
    version and cannot. Pure narrow filter: on a hive-partitioned
    snapshot the predicate rides the parquet scan (row-group pruning on
    ``valid_from`` if the layout clusters it), no shuffle, no UDF —
    at 100 TB an as-of read costs one pruned scan."""
    t = F.lit(ts).cast("timestamp")
    return snapshot.filter(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )


def scd2_diff(
    snapshot: DataFrame,
    ts_old,
    ts_new,
    key: str,
    attrs: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Churn report between two as-of points of an SCD2 snapshot: per
    key, ``added`` (alive at ``ts_new`` only), ``removed`` (alive at
    ``ts_old`` only), or ``changed`` (alive at both with ANY attr
    differing; null-safe compare). Unchanged keys are absent — at
    100 TB the diff is the small output by construction, and the plan
    is two narrow interval filters + one key-partitioned FULL OUTER
    join (exactly one row per key per side — the apply contract)."""
    old = scd2_as_of(snapshot, ts_old, from_col, to_col).select(
        F.col(key), *[F.col(a).alias(f"old_{a}") for a in attrs]
    )
    new = scd2_as_of(snapshot, ts_new, from_col, to_col).select(
        F.col(key), *[F.col(a).alias(f"new_{a}") for a in attrs]
    )
    # explicit presence markers: deriving presence from all-null attrs
    # would misclassify a row whose attrs are legitimately null
    old = old.withColumn("__in_old", F.lit(True))
    new = new.withColumn("__in_new", F.lit(True))
    joined = old.join(new, key, "full_outer")
    any_diff = F.lit(False)
    for a in attrs:
        any_diff = any_diff | ~F.col(f"old_{a}").eqNullSafe(F.col(f"new_{a}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            key,
            "change",
            *[F.col(f"old_{a}") for a in attrs],
            *[F.col(f"new_{a}") for a in attrs],
        )
    )


def persist_scd2_partitioned(
    df: DataFrame, base_dir: str, key: str, n_parts: int = 16
) -> None:
    """Lay an SCD2 snapshot down hive-partitioned on the key-hash
    bucket ``pb`` — the layout :func:`scd2_apply_partitioned` merges
    into. ``n_parts`` bounds both the partition-directory count and the
    per-merge rewrite grain; pick it so one bucket's rows fit a
    comfortable rewrite (e.g. 1024 buckets over 100 TB ≈ 100 GB per
    merge slice worst-case)."""
    pb = F.pmod(F.xxhash64(F.col(key)), F.lit(n_parts)).cast("int")
    (
        df.withColumn("pb", pb)
        .repartition("pb")
        .write.mode("overwrite")
        .partitionBy("pb")
        .parquet(base_dir)
    )
