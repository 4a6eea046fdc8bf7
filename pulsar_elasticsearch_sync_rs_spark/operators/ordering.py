"""Distributed total ordering — global row enumeration and the
deterministic epoch shuffle a training-data pipeline runs before every
pass over the corpus.

The reference hands ordering to Elasticsearch (documents land in index
order; `src/es.rs` bulk preserves batch sequence). A training pipeline
needs the stronger primitive: assign every row a GLOBAL position under
a total order, at scale. The obvious Spark spelling —
``row_number().over(Window.orderBy(...))`` — moves the ENTIRE dataset
to one partition (WindowExec with no partition spec), which is exactly
the plan that dies first at 100 TB. This module does it the
scale-correct way, the same two-pass shape RDD ``zipWithIndex`` uses
but staying in DataFrame/Arrow land:

  1. range-exchange on the order key + sort within partitions (the
     standard distributed total sort — Spark samples split points, so
     every partition holds a contiguous key range);
  2. one cheap counting pass over the ALREADY-SORTED checkpointed
     partitions (≤ numPartitions skinny rows to the driver);
  3. one PURE-JVM projection that adds ``offset[partition] +
     local_rank`` — ``monotonically_increasing_id()`` over the
     materialized sorted partitions encodes the within-partition rank
     in its low 33 bits, and the per-partition offsets ride a
     broadcast join — no Arrow crossing, no further shuffle, no
     window. (The first cut of this operator assigned positions in a
     ``mapInPandas`` pass; at 60M rows the Arrow round-trip WAS the
     wall — 42.9 s vs 6.6 s for this plan, SCALE.md round-12 table.)

The sorted frame is lazily ``localCheckpoint``-ed so the range sort is
paid ONCE, not re-executed by the counting job (the per-call persist
would leak the CacheManager entry — layout.py rule), and so the id
assignment reads a FIXED materialization (both the counting job and
the projection see identical partition row orders).

Keys that are provably UNIFORM on a known range (epoch_shuffle's md5
prefix) take the round-16 fast path instead: closed-form bucket
boundaries + a deterministic hash exchange that places bucket b in
physical partition b exactly — no sampler pass, no checkpoint, same
output contract (see ``global_index``'s ``uniform_long_range``).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id(): partition id in the upper 31 bits,
# within-partition record number in the lower 33
_MID_PARTITION_STRIDE = 1 << 33


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashInt`` (the hash behind ``F.hash``
    and ``HashPartitioning``, seed 42) for a 4-byte int — public
    MurmurHash3 algorithm, reimplemented so the driver can PREDICT
    which physical partition ``repartition(n, col)`` sends an int key
    to. Pinned bit-for-bit against ``F.hash`` in tests/test_ordering.py
    so a Spark hash change fails loudly."""
    m = 0xFFFFFFFF
    k1 = (x & m) * 0xCC9E2D51 & m
    k1 = ((k1 << 15) | (k1 >> 17)) & m
    k1 = k1 * 0x1B873593 & m
    h1 = seed ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & m
    h1 = (h1 * 5 + 0xE6546B64) & m
    # fmix, length = 4 bytes
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & m
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


# driver-known per-partition offsets attach as a folded literal-array
# lookup (one expression, no join, no broadcast-build job) up to this
# partition count; beyond it, a broadcast join keeps the plan bounded
_OFFSET_ARRAY_MAX_PARTS = 4096


def _attach_offsets(with_ids, off_rows, n_parts, out_col, start_acc):
    """(__pid, __mid) frame + driver-side [(pid, offset)] → frame with
    ``out_col`` = offset[pid] + within-partition rank. Offsets attach
    as ``element_at(<literal array>, __pid + 1)`` — Catalyst folds the
    array of driver ints into ONE literal, so no broadcast-build job
    and no join node per call (optimization round 16; measured: the
    createDataFrame broadcast build was one full job per
    global_index/prefix-sum call). Gaps (empty partitions) carry the
    running offset — no row holds such a pid, any value is unread.
    Above ``_OFFSET_ARRAY_MAX_PARTS`` partitions, falls back to the
    broadcast join (an offset array in the plan stays bounded)."""
    local_rank = F.col("__mid") - (
        F.col("__pid").cast("long") * F.lit(_MID_PARTITION_STRIDE)
    )
    if n_parts <= _OFFSET_ARRAY_MAX_PARTS:
        by_pid = dict(off_rows)
        fill, acc_fill = [], int(start_acc)
        for p in range(n_parts):
            acc_fill = by_pid.get(p, acc_fill)
            fill.append(acc_fill)
        arr = F.array(*[F.lit(int(v)).cast("long") for v in fill])
        return (
            with_ids.withColumn(
                out_col,
                F.element_at(arr, F.col("__pid") + F.lit(1)) + local_rank,
            )
            .drop("__pid", "__mid")
        )
    spark = with_ids.sparkSession
    offs = spark.createDataFrame(off_rows, "__pid int, __off long")
    return (
        with_ids.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, F.col("__off") + local_rank)
        .drop("__pid", "__mid", "__off")
    )


@_lru_cache(maxsize=16)
def _hash_partition_keys(n: int) -> tuple[int, ...]:
    """For each physical partition p in 0..n-1, the smallest
    non-negative int key v with ``pmod(murmur3(v), n) == p`` — so a
    ``repartition(n, key_column)`` whose key column holds ``keys[b]``
    for logical bucket ``b`` places bucket b EXACTLY in partition b.
    This is what lets :func:`global_index`'s uniform fast path keep the
    range-partitioned (ascending across partition index) output
    contract with a plain deterministic hash exchange — no sampler
    job, no checkpoint. Linear scan, expected ~n·ln(n) hash draws,
    cached per n."""
    keys: list[int | None] = [None] * n
    found = 0
    v = 0
    while found < n:
        p = _murmur3_int32(v) % n  # python % is already non-negative
        if keys[p] is None:
            keys[p] = v
            found += 1
        v += 1
    return tuple(keys)  # type: ignore[arg-type]


def global_index(
    df: DataFrame,
    order_col: str | list[str],
    out_col: str = "pos",
    start: int = 0,
    num_partitions: int | None = None,
    uniform_long_range: tuple[int, int] | None = None,
    class_stats: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = the 0-based (or ``start``-based) global rank
    of each row under ascending ``order_col`` — a total enumeration
    with NO single-partition window.

    Positions are exact and gap-free: ``start .. start + n - 1``, each
    exactly once. Ties in ``order_col`` receive arbitrary-but-
    deterministic-within-a-materialization positions (the range
    partitioner keeps equal keys in one partition, so re-reading the
    RESULT is stable; re-running the operator on differently-
    partitioned input may permute ties — pass a unique key, e.g.
    :func:`epoch_shuffle`'s md5, when cross-run determinism matters).

    Scale: one range exchange (the sort every total order costs), one
    ≤ numPartitions-row count collect, one pure-JVM projection (the
    offsets ride a broadcast join, so partition counts in the
    hundreds of thousands stay fine — no giant CASE expression).
    Contrast with ``row_number().over(Window.orderBy(...))``, which
    plans a single partition holding the full dataset — the pytest
    pins this plan shape (no WindowExec).

    Pass a SKINNY projection: the internal ``localCheckpoint`` is a
    materialization barrier Catalyst cannot prune columns through, so
    every input column is range-exchanged AND stored even if the
    caller immediately drops it (measured: enumerating the full
    documents table for a (pos, id) output checkpointed 11 GB of text
    and ran 4× slower at 5M docs — round-14 decade probe). Enumerate
    (id, order key), join payload back by id — unless the POINT is to
    move the payload into position order (persist_epoch_layout).

    ``order_col`` may be a LIST of columns — lexicographic composite
    order. Prefer native numeric columns over packed fixed-width
    strings: sorting (long, short-string) composites measured 1.8×
    faster than the equivalent 32-char hex string at 50M rows
    (round-14 sort-key A/B, SCALE.md).

    ``uniform_long_range=(lo, hi)`` (optimization round 16) — the
    caller vouches that ``order_col[0]`` is a LONG distributed
    ~uniformly on ``[lo, hi)``, that the composite key is
    duplicate-free, and that ``df`` is deterministic across
    re-executions (a scan or a pure projection of one). Range
    boundaries are then CLOSED-FORM (bucket b owns an equal slice of
    the key range, monotone in the key), so the operator drops BOTH
    the range-sampler job and the defensive localCheckpoint: a plain
    deterministic hash exchange places logical bucket b in physical
    partition b exactly (:func:`_hash_partition_keys`), re-executions
    land every row in the same partition with the same within-
    partition sorted rank (keys unique ⟹ total order), and the
    per-bucket counts come from one exchange-free aggregation over the
    source instead of a count over the checkpoint. Output contract is
    unchanged — including ascending positions across the physical
    partition index, which :func:`persist_ordered`'s ``pre_ranged``
    consumers rely on. :func:`epoch_shuffle` passes its md5-prefix
    range here; do NOT pass ranges for keys that are merely bounded
    but skewed — closed-form buckets of a skewed key are the
    too-few-distinct-values partitioning anti-pattern (guide §2.5) the
    sampler exists to avoid.

    ``class_stats`` (optimization round 16) — name of a column whose
    per-class ``(first_position, row_count)`` the caller needs anyway
    (:func:`interleave_by_weight`'s per-source offsets): the stats are
    derived from the SAME single collect that computes the partition
    offsets (grouped by (partition, class), min monotonic id — no
    value-order assumptions), and returned on the frame as
    ``_graft_class_stats`` — the separate full-frame aggregation job
    the caller would otherwise run is gone. Class cardinality must be
    driver-bounded (it was already: the caller collected one row per
    class)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    for c in order_cols:
        if c not in df.columns:
            raise ValueError(f"global_index: no column {c!r}")
    if out_col in df.columns:
        raise ValueError(f"global_index: column {out_col!r} already exists")
    # round-12 ADVICE: withColumn would silently OVERWRITE a same-named
    # input column and the final drop() would then delete the caller's
    # data — fail loudly like the other reserved-name guards
    for reserved in ("__pid", "__mid", "__off", "__bucket", "__bkey"):
        if reserved in df.columns:
            raise ValueError(
                f"global_index: column {reserved!r} already exists "
                "(reserved as an internal projection column)"
            )
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    spark = df.sparkSession
    if uniform_long_range is not None and n_parts <= 4096:
        if class_stats is not None:
            raise ValueError(
                "global_index: uniform_long_range and class_stats are "
                "mutually exclusive (no caller needs both)"
            )
        lo, hi = (int(uniform_long_range[0]), int(uniform_long_range[1]))
        if hi <= lo:
            raise ValueError(
                f"global_index: empty uniform_long_range [{lo}, {hi})"
            )
        div = -((lo - hi) // n_parts)  # ceil((hi-lo)/n): buckets < n_parts
        c0 = order_cols[0]
        raw_bucket = F.expr(f"(`{c0}` - {lo}) div {div}")
        # clamp (monotone) + NULL→0: NULL keys sort first under asc
        # just like the range partitioner placed them
        bucket = F.coalesce(
            F.least(
                F.lit(n_parts - 1).cast("bigint"),
                F.greatest(F.lit(0).cast("bigint"), raw_bucket),
            ),
            F.lit(0).cast("bigint"),
        )
        # exchange-free counts: partial agg over the (column-pruned)
        # source + a ≤ n_parts-row final — replaces BOTH the sampler
        # job and the checkpoint count job
        counts = (
            df.select(bucket.alias("__bucket"))
            .groupBy("__bucket")
            .count()
            .collect()
        )
        acc = int(start)
        off_rows = []
        for r in sorted(counts, key=lambda r: int(r["__bucket"])):
            off_rows.append((int(r["__bucket"]), acc))
            acc += int(r["count"])
        if not off_rows:
            return df.withColumn(out_col, F.lit(None).cast("long"))
        pkeys = _hash_partition_keys(n_parts)
        key_arr = F.array(*[F.lit(int(k)) for k in pkeys])
        placed = (
            df.withColumn(
                "__bkey",
                F.element_at(key_arr, bucket.cast("int") + F.lit(1)),
            )
            .repartition(n_parts, F.col("__bkey"))
            .sortWithinPartitions(*order_cols)
            .drop("__bkey")
        )
        with_ids = placed.withColumn(
            "__pid", F.spark_partition_id()
        ).withColumn("__mid", F.monotonically_increasing_id())
        # physical partition id == logical bucket by key construction,
        # so the bucket offsets attach straight on __pid
        out = _attach_offsets(with_ids, off_rows, n_parts, out_col, start)
        out._graft_row_count = acc - int(start)
        return out
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=False)
    )
    # both derived columns are evaluated over the CHECKPOINTED (already
    # sorted, order-frozen) partitions, so the low 33 bits of the
    # monotonic id ARE the within-partition sorted rank
    with_ids = ranged.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    cls_stats: dict | None = None
    if class_stats is None:
        counts = with_ids.groupBy("__pid").count().collect()
    else:
        if class_stats in ("count", "__minmid", "__pid"):
            raise ValueError(
                f"global_index: class_stats column {class_stats!r} "
                "collides with the stats aggregation's own output names"
            )
        # ONE collect serves the partition offsets AND the per-class
        # (first position, count) stats: min(__mid) locates each
        # class's block start inside its partition without assuming
        # the driver can reproduce Spark's class-value sort order
        rows = (
            with_ids.groupBy("__pid", class_stats)
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.min("__mid").alias("__minmid"),
            )
            .collect()
        )
        by_pid: dict[int, int] = {}
        for r in rows:
            by_pid[int(r["__pid"])] = by_pid.get(int(r["__pid"]), 0) + int(
                r["count"]
            )
        counts = [{"__pid": p, "count": c} for p, c in by_pid.items()]
    acc = int(start)
    off_rows = []
    off_by_pid: dict[int, int] = {}
    for r in sorted(counts, key=lambda r: r["__pid"]):
        off_rows.append((int(r["__pid"]), acc))
        off_by_pid[int(r["__pid"])] = acc
        acc += int(r["count"])
    if not off_rows:
        out = df.withColumn(out_col, F.lit(None).cast("long"))
        if class_stats is not None:
            out._graft_class_stats = {}
        return out
    if class_stats is not None:
        cls_stats = {}
        for r in rows:
            p = int(r["__pid"])
            g = off_by_pid[p] + (
                int(r["__minmid"]) - p * _MID_PARTITION_STRIDE
            )
            prev = cls_stats.get(r[class_stats])
            if prev is None:
                cls_stats[r[class_stats]] = [g, int(r["count"])]
            else:
                prev[0] = min(prev[0], g)
                prev[1] += int(r["count"])
        cls_stats = {k: (v[0], v[1]) for k, v in cls_stats.items()}
    out = _attach_offsets(with_ids, off_rows, n_parts, out_col, start)
    # the offsets collect already summed the exact row count — pin it
    # on THIS frame so consumers (epoch_shuffle_two_level) skip their
    # own count job. Safe by construction: DataFrame transformations
    # return new objects, so the attribute never survives a filter or
    # projection that could change the count.
    out._graft_row_count = acc - int(start)
    if class_stats is not None:
        out._graft_class_stats = cls_stats
    return out


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    out_col: str = "pos",
) -> DataFrame:
    """Deterministic corpus permutation for training epoch ``epoch``:
    every row gets ``out_col`` = its 0-based position in the shuffled
    order, where the order is ascending ``md5("ep{epoch}|" || id)`` —
    content-independent, reproducible across runs/partitionings/
    engines (DuckDB's md5 renders the identical hex, so the lane is
    hash-oracled), and a DIFFERENT permutation each epoch.

    This is the "shuffle once per epoch" step of a data loader, done
    as a layout instead of an in-memory operation: write the result
    range-partitioned and readers stream position ranges. Scale: the
    md5 is one narrow projection; everything else is
    :func:`global_index` over the uniform fast path (optimization
    round 16) — ONE deterministic exchange with closed-form bucket
    boundaries (the 60-bit md5 prefix is uniform by construction), no
    sampler pass, no checkpoint. At 100 TB the one exchange IS the
    product — there is no cheaper total permutation. Ties (md5
    collisions between distinct ids — astronomically rare, and already
    a cross-engine hazard for the oracle) are no longer frozen by a
    checkpoint: two ACTIONS over the same returned frame could permute
    tied rows; callers needing frozen ties checkpoint the result."""
    for reserved in ("__shuffle_key", "__shuffle_pref"):
        if reserved in df.columns:
            raise ValueError(
                f"epoch_shuffle: column {reserved!r} already exists "
                "(reserved as an internal sort key)"
            )
    key = F.md5(
        F.concat(
            F.lit(f"ep{int(epoch)}|"), F.col(id_col).cast("string")
        )
    )
    # sort by (60-bit numeric prefix, full hex): IDENTICAL total order
    # (the prefix is a monotone function of the first 15 hex chars and
    # the full key breaks its ties), but the compares run on a long
    # instead of a 32-byte string — 1.8× faster at 50M rows (round-14
    # sort-key A/B; the fourth-decade superlinearity was compare-bound)
    pref = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    # uniform fast path (optimization round 16): the 60-bit md5 prefix
    # is uniform on [0, 16^15) by construction and the (pref, hex)
    # composite is duplicate-free for distinct ids, so global_index
    # can place rows with closed-form range boundaries — no
    # range-sampler job, no checkpoint, one fewer pass over the corpus
    # per epoch (plan witness plans/r16/q_epoch_shuffle_after.txt)
    return global_index(
        df.withColumn("__shuffle_pref", pref).withColumn(
            "__shuffle_key", key
        ),
        ["__shuffle_pref", "__shuffle_key"],
        out_col,
        uniform_long_range=(0, 16**15),
    ).drop("__shuffle_key", "__shuffle_pref")


def persist_ordered(
    df: DataFrame,
    path: str,
    pos_col: str = "pos",
    n_files: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    pre_ranged: bool = False,
) -> None:
    """Write an enumerated frame as the at-rest training LAYOUT: files
    and row groups each own a contiguous, disjoint ``pos_col`` range,
    so a reader scanning ``pos BETWEEN a AND b`` (a data loader
    streaming one epoch slice, a resume from step N) prunes whole
    files/row groups from the parquet footers and reads ~(b−a)/n of
    the bytes. This is the missing half of :func:`epoch_shuffle` at
    100 TB: a training job consumes the LAYOUT, not a DataFrame of
    positions — shuffle once per epoch at write time, then every
    reader streams its position range with no shuffle at all.

    ``pre_ranged=True`` skips the range exchange + sort for frames
    taken STRAIGHT from :func:`global_index` / :func:`epoch_shuffle`
    (their output is already range-partitioned with ``pos`` ascending
    within and across partitions — positions are offsets over the
    sorted checkpoint), so the epoch write pays exactly ONE shuffle
    (the permutation itself), not two. The footer-stats pytest
    witnesses the contract either way — a caller that passes
    ``pre_ranged=True`` on a re-shuffled frame produces overlapping
    row-group ranges, which that test (and any skip-rate probe)
    exposes immediately.

    ``max_records_per_file`` bounds file size for parallel planning
    (splits preserve partition order, so each split file still owns a
    contiguous run)."""
    if pos_col not in df.columns:
        raise ValueError(f"persist_ordered: no column {pos_col!r}")
    out = df if pre_ranged else (
        df.repartitionByRange(n_files, F.col(pos_col)).sortWithinPartitions(
            pos_col
        )
    )
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)
    _write_layout_meta(path, pos_col)


# sidecar name: underscore prefix = invisible to Spark's parquet reader
# (the _SUCCESS convention), so the layout stays readable as plain
# parquet by engines that never heard of the meta
_META_NAME = "_meta.json"


def _write_layout_meta(
    path: str, pos_col: str, extra: dict | None = None
) -> None:
    """Round-13 VERDICT item 2: the writer knows n and the per-file
    position runs at write time — record them as a tiny JSON sidecar
    so :func:`position_shards` (called once per trainer RANK) never
    re-counts the corpus. Sourced from the freshly-written parquet
    FOOTERS (zero data scan, exact — the same witness the contiguity
    pytest reads), so the meta is correct for any write mode including
    append. Round-15: the envelope rides :mod:`layout_io` — local
    ``os``+pyarrow for scheme-less paths, the Hadoop FileSystem API +
    parquet-mr footers for ``hdfs://``/``s3a://``/``file://`` paths —
    so the whole sidecar protocol (no-count shards, zero-rewrite epoch
    reads, ``_CURRENT`` versioning) works on remote storage. Written
    atomically (tmp + overwrite-rename) so a reader never sees a torn
    sidecar."""
    from . import layout_io

    if not layout_io.isdir(path):
        return
    sized = layout_io.list_parquet_files(path)
    entries = _footer_entries(path, pos_col, [rel for rel, _ in sized])
    by_rel = dict(sized)
    for e in entries:
        e["bytes"] = int(by_rel.get(e["path"], 0))
    _publish_layout_meta(path, pos_col, entries, extra)
    # every publish invalidates the read path's per-process listing
    # cache: a same-process reader of a just-rewritten layout must
    # re-list, not judge freshness against the previous generation
    _listing_cached.cache_clear()


# remote layouts above this file count gather their per-file stats
# with ONE distributed Spark job instead of the driver-side footer
# loop: each py4j footer read costs ~20 ms of gateway round-trips
# (measured round 15 — a 100k-file layout would crawl for ~30 min),
# while a column-pruned groupBy(input_file_name) pass reads ~8 B/row
# of ONE column fully parallel. Local layouts always use pyarrow
# footers (0.2 ms/file — never worth a job).
_FOOTER_JOB_MIN_FILES = 64


def _footer_entries(
    path: str, pos_col: str, relpaths: list[str]
) -> list[dict]:
    """One sidecar entry per parquet file — pyarrow/parquet-mr footers
    for local or few-file layouts, the distributed stats job above the
    threshold."""
    from . import layout_io

    if layout_io.is_remote(path) and len(relpaths) > _FOOTER_JOB_MIN_FILES:
        return _footer_entries_job(path, pos_col, relpaths)
    return _footer_entries_loop(path, pos_col, relpaths)


def _footer_entries_loop(
    path: str, pos_col: str, relpaths: list[str]
) -> list[dict]:
    from . import layout_io

    entries = []
    for rel in relpaths:
        n_rows, pos_min, pos_max = layout_io.parquet_pos_stats(
            layout_io.join(path, rel), pos_col
        )
        entry = {"path": rel, "n_rows": int(n_rows)}
        if pos_min is not None:
            entry["pos_min"] = int(pos_min)
            entry["pos_max"] = int(pos_max)
        entries.append(entry)
    return entries


def _footer_entries_job(
    path: str, pos_col: str, relpaths: list[str]
) -> list[dict]:
    """Per-file (n_rows, pos_min, pos_max) via one column-pruned
    distributed aggregation — exact same values the footer statistics
    carry (row-group min/max over non-null longs ≡ row min/max).
    Zero-row part files produce no groups; they are re-attached with
    ``n_rows: 0`` so the sidecar's file list (the freshness witness)
    stays complete."""
    from urllib.parse import unquote

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"_footer_entries_job: no active SparkSession for the "
            f"distributed stats pass over {path!r}"
        )
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("__n")]
    has_pos = pos_col in df.columns
    if has_pos:
        aggs += [
            F.min(pos_col).alias("__mn"),
            F.max(pos_col).alias("__mx"),
            F.count(pos_col).alias("__nn"),
        ]
    rows = (
        df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    )
    # entries key on the file BASENAME (Spark part names embed a task
    # UUID, so collisions require a hand-built layout) — if one ever
    # appears, fall back to the exact per-file footer loop rather than
    # misattribute stats
    bases = [rel.rsplit("/", 1)[-1] for rel in relpaths]
    if len(set(bases)) != len(bases):
        return _footer_entries_loop(path, pos_col, relpaths)
    by_base: dict[str, dict] = {}
    for r in rows:
        base = unquote(r["__f"]).rstrip("/").rsplit("/", 1)[-1]
        entry = {"n_rows": int(r["__n"])}
        # nulls in pos would break the min/max ≡ footer-stats identity
        # — record no stats then, same as the footer path
        if has_pos and r["__mn"] is not None and r["__nn"] == r["__n"]:
            entry["pos_min"] = int(r["__mn"])
            entry["pos_max"] = int(r["__mx"])
        by_base[base] = entry
    entries = []
    for rel in relpaths:
        base = rel.rsplit("/", 1)[-1]
        got = by_base.get(base, {"n_rows": 0})
        entries.append({"path": rel, **got})
    return entries


def _publish_layout_meta(
    path: str, pos_col: str, entries: list[dict], extra: dict | None = None
) -> None:
    from . import layout_io

    doc: dict = {
        "n": int(sum(f["n_rows"] for f in entries)),
        "pos_col": pos_col,
        "files": entries,
    }
    if extra:
        doc.update(extra)
    if entries and all("pos_min" in f for f in entries):
        doc["pos_min"] = min(f["pos_min"] for f in entries)
        doc["pos_max"] = max(f["pos_max"] for f in entries)
    layout_io.write_json_atomic(path, _META_NAME, doc)


def read_layout_meta(path: str) -> dict | None:
    """The :func:`persist_ordered` sidecar, or None when absent (a
    layout written by an older writer or another engine — callers fall
    back to counting). Scheme-aware: remote layouts read the sidecar
    through the Hadoop FS API (a driver FS call, never a Spark job)."""
    from . import layout_io

    return layout_io.read_json(layout_io.join(path, _META_NAME))


def persist_epoch_layout(
    df: DataFrame,
    id_col: str,
    epoch: int,
    path: str,
    pos_col: str = "pos",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """:func:`epoch_shuffle` + :func:`persist_ordered` in one pass —
    the per-epoch data-loader artifact. One range exchange total (the
    permutation's own), written with tight per-file position runs; at
    100 TB the epoch prep is a single full shuffle and every trainer
    rank then reads exactly its position slice via footer pruning
    (:func:`read_position_range`)."""
    persist_ordered(
        epoch_shuffle(df, id_col, epoch, out_col=pos_col),
        path,
        pos_col=pos_col,
        max_records_per_file=max_records_per_file,
        mode=mode,
        pre_ranged=True,
    )


def position_shards(
    spark, path: str, n_ranks: int, pos_col: str = "pos"
) -> list[tuple[int, int, int]]:
    """Balanced contiguous position ranges for ``n_ranks`` data-loader
    ranks over a :func:`persist_ordered` layout: ``[(rank, lo, hi)]``
    with hi inclusive, sizes differing by at most one, disjoint and
    covering ``0..n−1`` (positions are gap-free by the global_index
    contract). Each trainer rank then calls
    :func:`read_position_range` with its bounds and scans only its
    slice via footer pruning — the standard sharded-epoch read, with
    the LAYOUT (not a shuffle service) doing the distribution. Ranks
    beyond the row count get empty ranges (lo > hi), never an error —
    a 1000-rank job over a small validation set must not crash.

    n comes from the layout's ``_meta.json`` sidecar (written by
    :func:`persist_ordered` from the parquet footers — NO Spark job,
    no scan: 1000 ranks each resolving their shard cost 1000 tiny
    JSON reads, not 1000 corpus counts; round-13 VERDICT item 2).
    Only a sidecar-less layout (older writer, foreign engine) falls
    back to the one column-pruned count, which is the sole use of
    ``spark`` here — with a sidecar present ``spark=None`` works."""
    if n_ranks < 1:
        raise ValueError("position_shards: n_ranks must be >= 1")
    meta = read_layout_meta(path)
    if meta is not None and not _layout_meta_fresh(path, meta, cached=True):
        # a foreign writer appended parquet files without rewriting the
        # sidecar: trusting the stale n would silently hand out shard
        # ranges that miss rows — prefer the loud count fallback
        # (round-14 ADVICE). One directory listing per process (shared
        # across the rank-resolution burst), still no scan.
        meta = None
    if meta is not None and meta.get("pos_col") == pos_col:
        n = int(meta["n"])
        lo = int(meta.get("pos_min", 0))
    else:
        if spark is None:
            # fail with the actual cause, not an AttributeError on
            # None.read (round-14 review finding): the sidecar-free
            # path NEEDS a session for the fallback count
            raise ValueError(
                f"position_shards: no usable _meta.json under {path} "
                f"(absent, foreign, or pos_col != {pos_col!r}) and no "
                "SparkSession given for the fallback count"
            )
        n = spark.read.parquet(path).count()
        lo = 0
    base, rem = divmod(n, n_ranks)
    out = []
    for r in range(n_ranks):
        size = base + (1 if r < rem else 0)
        out.append((r, lo, lo + size - 1))
        lo += size
    return out


def _listing_cached(path: str) -> frozenset:
    """One parquet-file listing per (process, layout path) — the READ
    path's freshness witness. A remote listing costs py4j round trips
    per file, and shard resolution is a burst (every rank resolves at
    once), so the burst shares one listing instead of paying
    files × ranks gateway calls. Writers (append_block_aligned) use
    the UNCACHED listing and invalidate this cache after publishing,
    so a same-process append never reads its own stale snapshot."""
    from . import layout_io

    return frozenset(layout_io.list_parquet_relpaths(path))


_listing_cached = _lru_cache(maxsize=32)(_listing_cached)


def _layout_meta_fresh(path: str, meta: dict, cached: bool = False) -> bool:
    """Cheap sidecar staleness check (round-14 ADVICE): the recorded
    file list must equal the directory's actual parquet files — a
    layout appended to by a writer that doesn't maintain `_meta.json`
    fails this and callers fall back to counting instead of silently
    mis-sharding. One listing, no footer reads, no Spark job;
    ``cached=True`` (the per-rank read path) shares one listing per
    process — a stale cache can only cause a spurious, SAFE
    fallback-to-count or a pre-append view, never a silent
    wrong-shard."""
    from . import layout_io

    recorded = {f["path"] for f in meta.get("files", [])}
    listing = (
        _listing_cached(path)
        if cached
        else frozenset(layout_io.list_parquet_relpaths(path))
    )
    return recorded == listing


def read_position_range(
    spark, path: str, start: int, end: int, pos_col: str = "pos"
) -> DataFrame:
    """The data-loader read: rows with ``start <= pos <= end`` from a
    :func:`persist_ordered` layout. The predicate is two INT-literal
    comparisons on a long column, so it reaches the parquet scan as
    PushedFilters and prunes every file/row group whose footer range
    misses the band (plan + skip-rate pinned in tests/test_ordering.py)
    — the scan cost is proportional to the slice, not the corpus."""
    return spark.read.parquet(path).filter(
        (F.col(pos_col) >= int(start)) & (F.col(pos_col) <= int(end))
    )


def _block_permutation(epoch: int, n_blocks: int) -> tuple[int, ...]:
    """brank[b] for every block b — the md5-ordered block permutation
    both the metadata job and the per-rank readers share. Computed
    driver-side (n_blocks keys, ~100k at the 100 TB grain) and CACHED
    per (epoch, n_blocks): 1000 rank calls in one driver pay the
    O(n_blocks log n_blocks) sort once, not per call (round-14
    ADVICE). The hex order is identical to sorting the same md5 keys
    in Spark or DuckDB, so every consumer agrees."""
    import hashlib

    order = sorted(
        range(n_blocks),
        key=lambda b: hashlib.md5(f"ep{int(epoch)}|b{b}".encode()).hexdigest(),
    )
    branks = [0] * n_blocks
    for i, b in enumerate(order):
        branks[b] = i
    return tuple(branks)


# per-epoch permutations are small (n_blocks ints); a handful of
# epochs in flight at once is the realistic ceiling
_block_permutation = _lru_cache(maxsize=8)(_block_permutation)


def epoch_shuffle_two_level(
    df: DataFrame,
    id_col: str,
    epoch: int,
    block_size: int,
    pos_col: str = "pos",
    out_col: str = "pos2",
    n: int | None = None,
) -> DataFrame:
    """TWO-LEVEL (block) epoch shuffle — the practice every large-scale
    loader (tf.data interleave+shuffle, WebDataset shard shuffling)
    actually uses at the 100 TB grain, where :func:`epoch_shuffle`'s
    exact permutation costs a full-corpus range exchange PER EPOCH:
    fix a base layout once (``pos_col`` from :func:`global_index` /
    :func:`persist_epoch_layout`, gap-free from 0), then derive each
    epoch's order by (1) permuting the ``block_size``-sized position
    BLOCKS by ``md5("ep{e}|b{block}")`` and (2) permuting rows WITHIN
    each block by ``md5("ep{e}|{id}")``. New position = permuted-block
    offset + within-block rank.

    What this buys at scale: the permutation METADATA (id → pos2)
    computes over a SKINNY projection — one hash exchange of ~16 B/doc
    for the bounded per-block window plus a ≤ n_blocks-row enumeration
    — and the corpus text never moves: a reader streams the EXISTING
    layout's blocks in permuted order (block ≡ file when the layout
    was written with ``max_records_per_file == block_size``, which the
    pytest witnesses from the ``_meta.json`` sidecar), shuffling
    within a block-sized buffer. Epoch N+1 is a metadata job, not a
    data rewrite. The trade-off is the standard one: block-level
    locality survives (rows of one block stay adjacent), which is why
    the base layout should itself be a :func:`epoch_shuffle` output,
    not arrival order.

    Deterministic, engine-portable (DuckDB renders identical md5 hex),
    gap-free: out positions are exactly 0..n−1. No single-partition
    window anywhere — the within-block window partitions by block
    (≤ block_size rows each) and the block permutation is driver-side
    arithmetic over ≤ n_blocks keys (shared, cached, with the sharded
    readers), shipped as a skinny broadcast frame.

    Pass ``n`` (the corpus row count — the layout's `_meta.json`
    sidecar already knows it, see :func:`read_layout_meta`) and the
    whole permutation METADATA job launches ZERO extra Spark jobs
    before the output action: no ``df.count()``, no block-frame probe
    (round-14 VERDICT item 6; the pytest counts jobs)."""
    if int(block_size) < 1:
        raise ValueError("epoch_shuffle_two_level: block_size must be >= 1")
    for reserved in ("__blk", "__wkey", "__within", "__brank"):
        if reserved in df.columns:
            raise ValueError(
                f"epoch_shuffle_two_level: column {reserved!r} already "
                "exists (reserved as an internal projection column)"
            )
    from pyspark.sql import Window

    r = int(block_size)
    if n is None:
        # a frame fresh from global_index carries its exact row count
        # (pinned by the offsets collect) — use it instead of paying a
        # count job over the derived lineage (round-15 optimization)
        n = getattr(df, "_graft_row_count", None)
    n = df.count() if n is None else int(n)
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    n_blocks = (n + r - 1) // r
    short = n - r * (n_blocks - 1)  # size of the LAST source block
    block = (F.col(pos_col) / F.lit(r)).cast("long")
    wkey = F.md5(
        F.concat(F.lit(f"ep{int(epoch)}|"), F.col(id_col).cast("string"))
    )
    # block permutation: driver-side closed form (cached), shipped as a
    # ≤ n_blocks-row broadcast — the same arithmetic the per-rank
    # readers use, so metadata job and sharded reads agree by
    # construction (it previously rode a distributed global_index over
    # range(n_blocks) plus a .first() probe: two extra jobs per epoch)
    branks = _block_permutation(int(epoch), n_blocks)
    short_rank = branks[n_blocks - 1]
    # offset of a block in the permuted order: brank·r, minus the
    # short block's deficit for every block scheduled after it
    deficit = r - short
    within = (
        F.row_number().over(
            Window.partitionBy("__blk").orderBy("__wkey", id_col)
        )
        - 1
    )
    keyed = (
        df.withColumn("__blk", block)
        .withColumn("__wkey", wkey)
        .withColumn("__within", within)
    )
    if n_blocks <= _OFFSET_ARRAY_MAX_PARTS:
        # ≤ a few thousand blocks: the brank map rides as ONE folded
        # literal array (no broadcast-build job, no join node —
        # optimization round 16, the _attach_offsets rationale); the
        # 100 TB grain (~100k blocks) keeps the broadcast frame below
        brank_col = F.element_at(
            F.array(*[F.lit(int(v)).cast("long") for v in branks]),
            F.col("__blk").cast("int") + F.lit(1),
        )
        offset = (brank_col * F.lit(r)) - F.when(
            brank_col > short_rank, F.lit(deficit)
        ).otherwise(F.lit(0))
        return keyed.withColumn(
            out_col, (offset + F.col("__within")).cast("long")
        ).drop("__blk", "__wkey", "__within")
    blocks = df.sparkSession.createDataFrame(
        [(int(b), int(v)) for b, v in enumerate(branks)],
        "__blk long, __brank long",
    )
    offset = (F.col("__brank") * F.lit(r)) - F.when(
        F.col("__brank") > short_rank, F.lit(deficit)
    ).otherwise(F.lit(0))
    return (
        keyed.join(F.broadcast(blocks), "__blk")
        .withColumn(out_col, (offset + F.col("__within")).cast("long"))
        .drop("__blk", "__wkey", "__within", "__brank")
    )


def persist_block_aligned(
    df: DataFrame,
    path: str,
    block_size: int,
    pos_col: str = "pos",
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """The physical artifact :func:`epoch_shuffle_two_level` streams:
    every parquet FILE is exactly one ``block_size``-row position
    block (the last block may be short), so "read blocks in permuted
    order" is literally "read files in permuted order". Mechanism:
    hash-repartition by block id (whole blocks stay together), sort by
    position within partitions (blocks appear ascending and complete —
    the short block is the max block id, so it sorts last in its
    partition), and split files every ``block_size`` rows — the splits
    land exactly on block boundaries. One hash exchange; files own
    contiguous DISJOINT position runs (block-grain, not globally
    sorted), and the ``_meta.json`` sidecar records them as usual."""
    r = int(block_size)
    if r < 1:
        raise ValueError("persist_block_aligned: block_size must be >= 1")
    if pos_col not in df.columns:
        raise ValueError(f"persist_block_aligned: no column {pos_col!r}")
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    block = (F.col(pos_col) / F.lit(r)).cast("long")
    out = df.repartition(n_parts, block).sortWithinPartitions(pos_col)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", r)
        .parquet(path)
    )
    _write_layout_meta(path, pos_col, extra={"block_size": r})


def append_block_aligned(
    df_new: DataFrame,
    path: str,
    order_col: str | list[str] | None = None,
    pos_col: str = "pos",
    pre_positioned: bool = False,
) -> dict:
    """Round-14 VERDICT item 2 — the GROWING-corpus story for the
    block-aligned layout, so incremental ingest (the engine's
    streaming dedup admits new docs continuously) never forces a full
    rewrite of the one artifact the two-level scheme promised to keep
    byte-stable. New rows get positions ``n .. n+m−1`` (enumerated by
    ``order_col`` among themselves — one range exchange over the NEW
    slice only) and land as NEW whole blocks; ``_meta.json`` is
    updated incrementally (footer reads for the new files only). The
    small-tail compaction rule: when the existing layout ends in a
    short block (n % block_size ≠ 0), that ONE file's rows are
    re-written together with the first new rows so the filled block
    stays file ≡ block — every other pre-existing file is
    byte-untouched (the pytest reuses the mtime/size witness), and
    the invariant ``only the LAST block may be short`` survives, so
    :func:`epoch_block_shards` simply deals the enlarged block set
    next epoch.

    Not concurrent-reader-safe across the tail rewrite (a reader
    holding the pre-append sidecar can race the tail file's delete) —
    same quiesce rule as :func:`prune_epoch_layouts`; use
    :func:`persist_epoch_layout_versioned` when readers must never
    block. Returns ``{"appended", "n", "tail_rewritten",
    "new_files"}``."""
    from . import layout_io

    spark = df_new.sparkSession
    meta = read_layout_meta(path)
    if meta is None or "block_size" not in meta:
        raise ValueError(
            f"append_block_aligned: no block-aligned _meta.json under "
            f"{path} - write the base layout with persist_block_aligned"
        )
    if meta.get("pos_col") != pos_col:
        raise ValueError(
            f"append_block_aligned: layout orders by "
            f"{meta.get('pos_col')!r}, not {pos_col!r}"
        )
    if not _layout_meta_fresh(path, meta):
        raise ValueError(
            f"append_block_aligned: _meta.json under {path} disagrees "
            "with the directory listing (foreign writer?) - rebuild the "
            "layout with persist_block_aligned"
        )
    if pre_positioned:
        # caller assigned positions (interleave_append's continued
        # schedule): validate the contract this function otherwise
        # guarantees — exactly n..n+m−1, gap-free — with one skinny agg
        if pos_col not in df_new.columns:
            raise ValueError(
                f"append_block_aligned: pre_positioned=True but "
                f"{pos_col!r} is absent from the new rows"
            )
    elif pos_col in df_new.columns:
        raise ValueError(
            f"append_block_aligned: {pos_col!r} is assigned here - "
            "pass the new rows WITHOUT positions (or pre_positioned=True)"
        )
    elif order_col is None:
        raise ValueError(
            "append_block_aligned: order_col is required unless "
            "pre_positioned=True"
        )
    r = int(meta["block_size"])
    n_old = int(meta["n"])
    old_entries = [f for f in meta["files"] if f.get("n_rows", 0) > 0]
    layout_cols = set(spark.read.parquet(path).columns)
    want_cols = layout_cols if pre_positioned else layout_cols - {pos_col}
    if set(df_new.columns) != want_cols:
        raise ValueError(
            "append_block_aligned: new-row columns "
            f"{sorted(df_new.columns)} do not match the layout's "
            f"{sorted(want_cols)}"
        )
    if pre_positioned:
        # one skinny agg validates the gap-free contract AND yields m
        # (no separate count job)
        stats = df_new.agg(
            F.count(F.lit(1)).alias("m"),
            F.min(pos_col).alias("mn"),
            F.max(pos_col).alias("mx"),
            F.count_distinct(F.col(pos_col)).alias("nd"),
        ).first()
        m = int(stats["m"])
        if m == 0:
            return {"appended": 0, "n": n_old, "tail_rewritten": False,
                    "new_files": []}
        if (int(stats["mn"]), int(stats["mx"]), int(stats["nd"])) != (
            n_old, n_old + m - 1, m
        ):
            raise ValueError(
                f"append_block_aligned: pre-positioned rows must cover "
                f"exactly {n_old}..{n_old + m - 1} gap-free, got "
                f"min={stats['mn']} max={stats['mx']} distinct={stats['nd']}"
            )
        new_rows = df_new
    else:
        m = df_new.count()
        if m == 0:
            return {"appended": 0, "n": n_old, "tail_rewritten": False,
                    "new_files": []}
        new_rows = global_index(
            df_new, order_col, out_col=pos_col, start=n_old
        )
    tail = n_old % r
    tail_entry = None
    if tail:
        tb = (n_old // r) * r  # short block's first position
        cands = [f for f in old_entries if f.get("pos_min") == tb]
        if len(cands) != 1:
            raise ValueError(
                f"append_block_aligned: expected exactly one tail file "
                f"at pos {tb} under {path}, found {len(cands)} - layout "
                "is not block-aligned"
            )
        tail_entry = cands[0]
        tail_rows = spark.read.parquet(
            layout_io.join(path, tail_entry["path"])
        )
        combined = tail_rows.unionByName(new_rows.select(*tail_rows.columns))
    else:
        combined = new_rows

    recorded = {f["path"] for f in meta["files"]}
    block = (F.col(pos_col) / F.lit(r)).cast("long")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_parts = max(1, min(n_parts, ((m + tail) + r - 1) // r))
    (
        combined.repartition(n_parts, block)
        .sortWithinPartitions(pos_col)
        .write.mode("append")
        .option("maxRecordsPerFile", r)
        .parquet(path)
    )
    if tail_entry is not None:
        layout_io.delete_file(layout_io.join(path, tail_entry["path"]))
    sized = layout_io.list_parquet_files(path)
    new_files = [p for p, _ in sized if p not in recorded]
    new_entries = _footer_entries(path, pos_col, new_files)
    by_rel = dict(sized)
    for e in new_entries:
        e["bytes"] = int(by_rel.get(e["path"], 0))
    entries = [
        f
        for f in meta["files"]
        if tail_entry is None or f["path"] != tail_entry["path"]
    ] + new_entries
    _publish_layout_meta(path, pos_col, entries, extra={"block_size": r})
    _listing_cached.cache_clear()  # same-process readers re-list
    return {
        "appended": int(m),
        "n": n_old + int(m),
        "tail_rewritten": tail_entry is not None,
        "new_files": new_files,
    }


def epoch_block_shards(
    path: str, epoch: int, n_ranks: int
) -> list[tuple[int, list[str]]]:
    """Rank → file-list resolution for the two-level epoch read over a
    :func:`persist_block_aligned` layout: permute the layout's files
    (≡ blocks) by ``md5("ep{e}|b{block}")`` — the SAME schedule
    :func:`epoch_shuffle_two_level` uses — and deal them to
    ``n_ranks`` ranks in contiguous runs of the permuted order, sizes
    differing by ≤ 1 file. Pure sidecar arithmetic (`_meta.json` —
    no Spark session, no scan, the position_shards discipline): 1000
    ranks cost 1000 JSON reads. Each rank then reads ONLY its files
    (:func:`read_epoch_block_shard`) — 1/N of the corpus bytes, no
    filter evaluation, no rewrite, for EVERY epoch."""
    import hashlib

    from . import layout_io

    if n_ranks < 1:
        raise ValueError("epoch_block_shards: n_ranks must be >= 1")
    meta = read_layout_meta(path)
    if meta is None:
        raise ValueError(
            f"epoch_block_shards: no _meta.json under {path} - write the "
            "layout with persist_block_aligned"
        )
    # zero-row part files (an empty corpus writes one) carry no pos
    # stats and no data — they belong to no block; dropping them keeps
    # the empty-input totality contract (round-14 review finding,
    # confirmed by execution)
    files = [f for f in meta["files"] if f.get("n_rows", 0) > 0]
    if not files:
        return [(r, []) for r in range(n_ranks)]
    # a foreign layout can record rows without position statistics
    # (pos col absent from the footer stats) — refuse with the pointed
    # error, not a KeyError two lines down (round-14 ADVICE)
    no_stats = [f["path"] for f in files if "pos_min" not in f]
    if no_stats:
        raise ValueError(
            f"epoch_block_shards: {len(no_stats)} file(s) under {path} "
            f"carry no {meta.get('pos_col', 'pos')!r} statistics (e.g. "
            f"{no_stats[0]}) - layout is not block-aligned; write it "
            "with persist_block_aligned"
        )
    # the writer records block_size; max-run inference is only the
    # fallback for a foreign aligned layout (wrong when every block is
    # short of the writer's size — e.g. a single sub-block file)
    block_size = int(
        meta.get("block_size")
        or max(f["pos_max"] - f["pos_min"] + 1 for f in files)
    )
    # file ≡ block: every run starts on a block boundary and only the
    # last block may be short — refuse a misaligned layout loudly
    for f in files:
        if f["pos_min"] % block_size != 0:
            raise ValueError(
                f"epoch_block_shards: {f['path']} starts at pos "
                f"{f['pos_min']} (not a multiple of {block_size}) - layout "
                "is not block-aligned"
            )
    permuted = sorted(
        files,
        key=lambda f: hashlib.md5(
            f"ep{int(epoch)}|b{f['pos_min'] // block_size}".encode()
        ).hexdigest(),
    )
    base, rem = divmod(len(permuted), n_ranks)
    out = []
    i = 0
    for r in range(n_ranks):
        size = base + (1 if r < rem else 0)
        out.append(
            (r, [layout_io.join(path, f["path"]) for f in permuted[i:i + size]])
        )
        i += size
    return out


def epoch_block_manifest(
    path: str, epoch: int, n_ranks: int
) -> list[tuple[int, list[dict]]]:
    """The PREFETCH MANIFEST for an external data loader: for every
    rank, its :func:`epoch_block_shards` files IN STREAMING ORDER,
    each with ``{"path", "bytes", "n_rows", "pos2_lo", "pos2_hi"}`` —
    the byte budget a prefetcher needs to schedule reads ahead of the
    training step, and the epoch-position span each file will yield
    (inclusive), so progress/ETA and :func:`read_epoch_block_shard`'s
    ``start_step`` resume point can be computed without opening a
    single file. Pure sidecar + cached-permutation arithmetic — no
    SparkSession, no scan; ``bytes`` is None for sidecars written
    before round 15 (re-write the layout to refresh)."""
    meta = read_layout_meta(path)
    if meta is None:
        raise ValueError(
            f"epoch_block_manifest: no _meta.json under {path} - write "
            "the layout with persist_block_aligned"
        )
    files = [f for f in meta["files"] if f.get("n_rows", 0) > 0]
    n = int(meta["n"])
    if not files or n == 0:
        return [(r, []) for r in range(n_ranks)]
    block_size = int(
        meta.get("block_size")
        or max(f["pos_max"] - f["pos_min"] + 1 for f in files)
    )
    n_blocks = (n + block_size - 1) // block_size
    branks = _block_permutation(int(epoch), n_blocks)
    short_rank = branks[n_blocks - 1]
    short = n - block_size * (n_blocks - 1)
    deficit = block_size - short
    from . import layout_io

    # epoch_block_shards returns layout_io.join(path, rel) strings —
    # index the sidecar entries by the same key
    by_path = {layout_io.join(path, f["path"]): f for f in files}
    out = []
    for rank, shard in epoch_block_shards(path, epoch, n_ranks):
        entries = []
        for fp in shard:
            f = by_path[fp]
            b = int(f["pos_min"]) // block_size
            brk = branks[b]
            off = brk * block_size - (deficit if brk > short_rank else 0)
            size = short if b == n_blocks - 1 else block_size
            entries.append(
                {
                    "path": fp,
                    "bytes": f.get("bytes"),
                    "n_rows": int(f["n_rows"]),
                    "pos2_lo": int(off),
                    "pos2_hi": int(off + size - 1),
                }
            )
        out.append((rank, entries))
    return out


def read_epoch_block_shard(
    spark,
    path: str,
    epoch: int,
    rank: int,
    n_ranks: int,
    id_col: str,
    pos_col: str = "pos",
    out_col: str = "pos2",
    start_step: int = 0,
) -> DataFrame:
    """One rank's slice of the two-level epoch order, read from the
    block-aligned layout: load ONLY the rank's files (resolved by
    :func:`epoch_block_shards` — a listing of 1/N of the corpus, no
    predicate needed) and attach each row's epoch position
    ``out_col`` via the closed-form within-block md5 rank + the
    global block offsets (both from sidecar arithmetic + one bounded
    per-block window over the rank's own rows). The union of all
    ranks' frames is exactly :func:`epoch_shuffle_two_level`'s output
    (pytest-pinned) — distribution by LAYOUT, not by shuffle.

    ``start_step`` is the RESUME path: a trainer restarting from
    global step S (epoch positions ≥ S) re-issues the read and gets
    exactly its shard's suffix. Because a rank owns a CONTIGUOUS run
    of the permuted block order, whole files strictly below S are
    dropped from the listing by sidecar arithmetic (never opened, let
    alone read) and only the one boundary block pays a row filter —
    resume cost is proportional to what remains, not to how far the
    run had progressed."""
    from pyspark.sql import Window

    from . import layout_io

    meta = read_layout_meta(path)
    files = meta["files"] if meta else []
    block_size = int(
        (meta or {}).get("block_size")
        or (max(f["pos_max"] - f["pos_min"] + 1 for f in files) if files else 1)
    )
    n = int(meta["n"]) if meta else 0
    n_blocks = (n + block_size - 1) // block_size if n else 0
    shard_files = dict(epoch_block_shards(path, epoch, n_ranks))[rank]
    if shard_files and start_step > 0:
        # permuted-order span of a file's block: [offset, offset+size)
        # with offset = brank·r − deficit·[brank > short_rank] — keep
        # files whose span reaches start_step
        _branks = _block_permutation(int(epoch), n_blocks)
        _sr = _branks[n_blocks - 1]
        _short = n - block_size * (n_blocks - 1)
        _def = block_size - _short
        by_path = {
            layout_io.join(path, f["path"]): int(f["pos_min"]) // block_size
        for f in files if f.get("n_rows", 0) > 0}
        kept = []
        for fp in shard_files:
            b = by_path[fp]
            brk = _branks[b]
            off = brk * block_size - (_def if brk > _sr else 0)
            size = _short if b == n_blocks - 1 else block_size
            if off + size > int(start_step):
                kept.append(fp)
        shard_files = kept
    if not shard_files:
        return (
            spark.read.parquet(path)
            .limit(0)
            .withColumn(out_col, F.lit(None).cast("long"))
        )
    df = spark.read.parquet(*shard_files)
    for reserved in ("__blk", "__wkey", "__brank"):
        if reserved in df.columns:
            raise ValueError(
                f"read_epoch_block_shard: layout column {reserved!r} "
                "collides with an internal projection column"
            )
    # same arithmetic as epoch_shuffle_two_level, over this rank only
    r = block_size
    short = n - r * (n_blocks - 1)
    deficit = r - short
    # the full permutation is cached per (epoch, n_blocks) — 1000 rank
    # calls in one driver sort the md5 keys ONCE (round-14 ADVICE) —
    # and the shipped frame is restricted to the RANK'S OWN blocks
    # (the shard files' pos_min ranges), not all n_blocks
    branks = _block_permutation(int(epoch), n_blocks)
    short_rank = branks[n_blocks - 1]
    shard_set = set(shard_files)
    rank_blocks = sorted(
        {int(f["pos_min"]) // r for f in meta["files"]
         if f.get("n_rows", 0) > 0
         and layout_io.join(path, f["path"]) in shard_set}
    )
    block = (F.col(pos_col) / F.lit(r)).cast("long")
    wkey = F.md5(
        F.concat(F.lit(f"ep{int(epoch)}|"), F.col(id_col).cast("string"))
    )
    # block→brank rides a broadcast join (skinny rows), not a literal
    # map expression — 100k+ blocks would blow the plan size
    branks_df = spark.createDataFrame(
        [(int(b), int(branks[b])) for b in rank_blocks],
        "__blk long, __brank long",
    )
    offset = (F.col("__brank") * F.lit(r)) - F.when(
        F.col("__brank") > short_rank, F.lit(deficit)
    ).otherwise(F.lit(0))
    within = (
        F.row_number().over(
            Window.partitionBy("__blk").orderBy("__wkey", id_col)
        )
        - 1
    )
    out = (
        df.withColumn("__blk", block)
        .withColumn("__wkey", wkey)
        .join(F.broadcast(branks_df), "__blk")
        .withColumn(out_col, (offset + within).cast("long"))
        .drop("__blk", "__wkey", "__brank")
    )
    if start_step > 0:
        # only the boundary block's rows actually evaluate to < S —
        # every earlier file was already dropped from the listing
        out = out.filter(F.col(out_col) >= int(start_step))
    return out


def interleave_by_weight(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int] | Callable[[str], int],
    id_col: str,
    out_col: str = "pos",
) -> DataFrame:
    """Deterministic WEIGHTED INTERLEAVE of a multi-source corpus —
    the "blendable dataset" layout every mixture-trained LLM loader
    implements (NeMo/Megatron blending; reference behavior: the
    reference interleaves per-topic streams into one sink order,
    `src/pulsar.rs` multi-topic consume loop): every row gets a global
    position such that EVERY contiguous position slice carries the
    sources in the requested ratio (deviation ≤ ~1 doc per source per
    slice boundary — the Bresenham property), rather than
    concatenating sources or relying on random shuffling to mix them.
    q_domain_mix decides HOW MANY docs of each source survive;
    this operator decides WHERE they sit, so a trainer rank reading
    positions [a, b) gets the target mixture without any shuffle at
    read time.

    Mechanism (exact integer arithmetic, engine-portable): per-source
    rank r via ONE :func:`global_index` over (source, id) — ranks
    within a source are contiguous under that order, so per-source
    rank = global rank − the source's offset (one tiny agg +
    broadcast); interleave key = (r + 1) · (L / w_source) with L =
    lcm(weights) — the classic smallest-virtual-time-first schedule —
    and final position computed in CLOSED FORM from the per-source
    (offset, count, stride) constants (the rank of v in the merged
    ascending (vkey, source, id) order is a sum of per-source
    floor-division terms — see the inline derivation), so the second
    range exchange the operator used to pay is gone (optimization
    round 15). Above 16 sources the closed-form expression would be
    O(sources) per row, so that path still ranks via
    :func:`global_index` over the native composite — identical order.

    Scale: ONE range exchange (over a SKINNY projection if the
    caller selects first) + one ≤ #sources-row collect; no
    window, no UDF. Sources absent from ``weights`` raise (silent
    drop or weight-1 defaulting would corrupt the mixture contract).
    Output = input columns + ``out_col``.

    ``weights`` may instead be a CALLABLE ``source -> int`` (a
    closed-form weight rule): the rule is applied to exactly the
    sources the post-rank stats collect surfaces, so the caller skips
    the separate distinct-scan job it would otherwise run just to
    enumerate sources for the dict (optimization round 15 — one full
    source-column scan per call at corpus scale). Positions are
    identical to passing ``{s: fn(s) for s in distinct_sources}``."""
    import math

    weight_fn = weights if callable(weights) else None
    if weight_fn is None:
        if not weights:
            raise ValueError("interleave_by_weight: weights must be non-empty")
        for s, w in weights.items():
            if int(w) < 1:
                raise ValueError(
                    f"interleave_by_weight: weight for {s!r} must be >= 1"
                )
    for reserved in ("__vkey", "__grank", "__soff", "__sstride"):
        if reserved in df.columns:
            raise ValueError(
                f"interleave_by_weight: column {reserved!r} is reserved"
            )
    # per-source contiguous ranks: one global_index over the NATIVE
    # (source, id) composite — no packed-string key (the round-14
    # sort-key A/B: numeric compares beat fixed-width strings).
    # class_stats (optimization round 16): the per-source
    # (offset, count) stats ride global_index's OWN offsets collect —
    # grouped by (partition, source) with min(monotonic id), so class
    # block starts are located without any driver-side value-order
    # assumption (the round-14 review rule) and the separate
    # full-frame stats aggregation job this operator used to run per
    # call is gone. Same collect still doubles as the unknown-source
    # validation.
    ranked = global_index(
        df, [source_col, id_col], out_col="__grank", class_stats=source_col
    )
    stats = ranked._graft_class_stats
    offs = {s: off for s, (off, _) in stats.items()}
    if weight_fn is not None:
        weights = {s: int(weight_fn(s)) for s in offs}
        bad = [s for s, w in weights.items() if w < 1]
        if bad:
            raise ValueError(
                f"interleave_by_weight: weight rule returned < 1 for {bad!r}"
            )
    else:
        unknown = [s for s in offs if s not in weights]
        if unknown:
            raise ValueError(
                f"interleave_by_weight: sources {unknown!r} have no weight "
                "(explicit weights only - a default would corrupt the mixture)"
            )
    if not offs:
        # empty corpus: no sources, no positions — same schema as the
        # non-empty path (input columns + null out_col), mirroring
        # global_index's own empty contract
        return ranked.drop("__grank").withColumn(
            out_col, F.lit(None).cast("long")
        )
    lcm = 1
    for w in weights.values():
        lcm = lcm * int(w) // math.gcd(lcm, int(w))
    if len(offs) <= 16:
        # few sources (the typical mixture): inline literal CASE for
        # the virtual key, then a CLOSED-FORM final position — the
        # second range exchange the operator used to pay (a
        # global_index over (vkey, source, id)) is replaced by per-row
        # integer arithmetic over the per-source constants
        # (optimization round 15, guide §2.4 "remove shuffles
        # outright"). With stride_s = L/w_s and per-source rank r,
        # this row's key is v = (r+1)·stride_s and its rank in the
        # ascending (vkey, source, id) order is exactly
        #   pos = Σ_{s'} min(n_s', ⌊(v−1)/stride_s'⌋)   (rows with vkey' < v)
        #       + Σ_{s' < s} [stride_s' divides v  AND
        #                     v/stride_s' ≤ n_s']       (vkey ties)
        # — vkey is strictly monotone in rank within a source, so the
        # id tiebreak can never decide between equal (vkey, source)
        # pairs and drops out of the formula. Source comparisons use
        # Spark's own ordering (lit < col), the same collation the
        # retired sort used. The oracle lanes and the virtual-time
        # property test pin the equality.
        off_expr = F.lit(None).cast("long")
        stride_expr = F.lit(None).cast("long")
        for s, off in offs.items():
            off_expr = F.when(F.col(source_col) == s, F.lit(off)).otherwise(
                off_expr
            )
            stride_expr = F.when(
                F.col(source_col) == s, F.lit(lcm // int(weights[s]))
            ).otherwise(stride_expr)
        vkeyed = ranked.withColumn(
            "__vkey", (F.col("__grank") - off_expr + F.lit(1)) * stride_expr
        )
        pos = None
        for s, (_, n_s) in stats.items():
            stride = int(lcm // int(weights[s]))
            # integer `div`, NOT float `/`: v can exceed double's
            # 53-bit mantissa at corpus scale; stride is our own int()
            qm1 = F.expr(f"(__vkey - 1) div {stride}")
            term = F.least(F.lit(n_s), qm1)
            tie = F.when(
                (F.lit(s) < F.col(source_col))
                & (F.pmod(F.col("__vkey"), F.lit(stride)) == 0)
                & (F.expr(f"__vkey div {stride}") <= F.lit(n_s)),
                F.lit(1),
            ).otherwise(F.lit(0))
            t = term + tie
            pos = t if pos is None else pos + t
        return vkeyed.withColumn(out_col, pos.cast("long")).drop(
            "__vkey", "__grank"
        )
    else:
        # high-cardinality source column: a chained WHEN per source
        # reproduces the giant-CASE plan shape global_index's own
        # notes avoid — ship (source, off, stride) as a broadcast
        # join instead (round-14 ADVICE)
        src_type = dict(ranked.dtypes)[source_col]
        sos = ranked.sparkSession.createDataFrame(
            [
                (s, int(off), int(lcm // int(weights[s])))
                for s, off in offs.items()
            ],
            f"`{source_col}` {src_type}, __soff long, __sstride long",
        )
        vkeyed = (
            ranked.join(F.broadcast(sos), source_col)
            .withColumn(
                "__vkey",
                (F.col("__grank") - F.col("__soff") + F.lit(1))
                * F.col("__sstride"),
            )
            .drop("__soff", "__sstride")
        )
    # >16 sources: the closed-form per-row sum would be an O(sources)
    # expression per row (the giant-CASE shape); rank the native
    # (virtual-time, source, id) composite with the range exchange
    # instead — identical total order
    return global_index(
        vkeyed,
        ["__vkey", source_col, id_col],
        out_col=out_col,
    ).drop("__vkey", "__grank")


def interleave_append(
    df_new: DataFrame,
    path: str,
    source_col: str,
    weights: dict[str, int],
    id_col: str,
    pos_col: str = "pos",
    mode: str = "fresh",
) -> dict:
    """MIXTURE-PRESERVING GROWTH — the missing edge between
    :func:`interleave_by_weight` (write-once blend) and
    :func:`append_block_aligned` (growth): new docs are blended into
    the appended position region [n, n+m) by the virtual-time
    schedule instead of being concatenated in arrival order, and land
    through ``append_block_aligned(pre_positioned=True)``: new whole
    blocks, tail compaction, full blocks byte-untouched. Two blending
    semantics, both deterministic and engine-portable:

    - ``mode="fresh"`` (default): the increment is interleaved on its
      OWN schedule (``vkey = (r' + 1) · (L / w_s)``) — every
      contiguous slice of the appended region carries the configured
      mixture (the plain Bresenham property), regardless of what the
      layout's historical composition looks like. The right choice
      when training consumes the appended region as its own stream.
    - ``mode="continue"``: each source's rank sequence RESUMES at its
      laid-out count (``vkey = (n_s + r' + 1) · (L / w_s)``) — a
      deficit/catch-up scheduler: sources whose laid-out share is
      BELOW their target ratio exhausted the old schedule early, so
      their virtual clocks lag and their new docs front-load the
      appended region until the GLOBAL ratios converge toward the
      target. The right choice when the mixture contract is over the
      whole corpus and history under-served some source. (Found by
      the mixture pytest: continuing after an exhausted source is NOT
      slice-mixture-preserving — it is ratio-healing. Both semantics
      are therefore explicit, never implied.)

    Scale: one column-pruned ``groupBy(source)`` over the layout (the
    per-source offsets, ``continue`` only — one narrow column), one
    range exchange over the NEW slice (its own global_index), plus
    the append machinery. Weights must cover every source in the new
    slice (same loud contract as the interleave). Returns
    :func:`append_block_aligned`'s report."""
    import math

    if mode not in ("fresh", "continue"):
        raise ValueError(
            f"interleave_append: unknown mode {mode!r} "
            "(expected 'fresh' or 'continue')"
        )
    if not weights:
        raise ValueError("interleave_append: weights must be non-empty")
    for s, w in weights.items():
        if int(w) < 1:
            raise ValueError(
                f"interleave_append: weight for {s!r} must be >= 1"
            )
    for reserved in ("__vkey", "__nrank", "__soff", "__scnt"):
        if reserved in df_new.columns:
            raise ValueError(
                f"interleave_append: column {reserved!r} is reserved"
            )
    spark = df_new.sparkSession
    meta = read_layout_meta(path)
    if meta is None or "block_size" not in meta:
        raise ValueError(
            f"interleave_append: no block-aligned _meta.json under "
            f"{path} - write the base layout with persist_block_aligned"
        )
    n_old = int(meta["n"])
    # per-source consumed counts from the layout (continue mode's
    # virtual-clock resume points) — ONE column-pruned agg
    laid = (
        {
            r[source_col]: int(r["c"])
            for r in spark.read.parquet(path)
            .groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        if mode == "continue"
        else {}
    )
    lcm = 1
    for w in weights.values():
        lcm = lcm * int(w) // math.gcd(lcm, int(w))
    # per-source ranks among the NEW docs (the interleave recipe)
    ranked = global_index(df_new, [source_col, id_col], out_col="__nrank")
    stats = {
        r[source_col]: (int(r["off"]), int(r["cnt"]))
        for r in ranked.groupBy(source_col)
        .agg(F.min("__nrank").alias("off"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offs = {s: off for s, (off, _) in stats.items()}
    unknown = [s for s in offs if s not in weights]
    if unknown:
        raise ValueError(
            f"interleave_append: sources {unknown!r} have no weight "
            "(explicit weights only - a default would corrupt the mixture)"
        )
    if len(offs) <= 16:
        off_expr = F.lit(None).cast("long")
        stride_expr = F.lit(None).cast("long")
        base_expr = F.lit(None).cast("long")
        for s, off in offs.items():
            off_expr = F.when(F.col(source_col) == s, F.lit(off)).otherwise(
                off_expr
            )
            stride_expr = F.when(
                F.col(source_col) == s, F.lit(lcm // int(weights[s]))
            ).otherwise(stride_expr)
            base_expr = F.when(
                F.col(source_col) == s, F.lit(int(laid.get(s, 0)))
            ).otherwise(base_expr)
        # continued schedule: source rank resumes at n_s (fresh: 0)
        keyed = ranked.withColumn(
            "__vkey",
            (base_expr + (F.col("__nrank") - off_expr) + F.lit(1))
            * stride_expr,
        )
        # CLOSED-FORM appended position (the interleave_by_weight
        # derivation with per-source virtual-clock bases): among the
        # NEW rows, source s' contributes
        # clamp(⌊(v−1)/stride_s'⌋ − base_s', 0, m_s') rows with
        # vkey' < v, plus the tie indicator for s' < s when v sits on
        # s'-schedule slot base_s' < v/stride_s' ≤ base_s'+m_s'. The
        # second range exchange (global_index over (vkey, source,
        # id)) is gone; append_block_aligned's pre-positioned agg
        # still independently witnesses gap-free coverage
        # n..n+m−1 (optimization round 15).
        pos = F.lit(int(n_old))
        for s, (_, m_s) in stats.items():
            stride = int(lcm // int(weights[s]))
            base = int(laid.get(s, 0))
            qm1 = F.expr(f"(__vkey - 1) div {stride}")
            term = F.greatest(
                F.lit(0), F.least(F.lit(m_s), qm1 - F.lit(base))
            )
            q = F.expr(f"__vkey div {stride}")
            tie = F.when(
                (F.lit(s) < F.col(source_col))
                & (F.pmod(F.col("__vkey"), F.lit(stride)) == 0)
                & (q > F.lit(base))
                & (q <= F.lit(base + m_s)),
                F.lit(1),
            ).otherwise(F.lit(0))
            pos = pos + term + tie
        positioned = keyed.withColumn(pos_col, pos.cast("long")).drop(
            "__vkey", "__nrank"
        )
        return append_block_aligned(
            positioned, path, pos_col=pos_col, pre_positioned=True
        )
    else:
        # high-cardinality source column: broadcast the per-source
        # constants instead of a chained WHEN (the interleave_by_weight
        # rule, round-14 ADVICE)
        src_type = dict(ranked.dtypes)[source_col]
        sos = spark.createDataFrame(
            [
                (s, int(off), int(lcm // int(weights[s])),
                 int(laid.get(s, 0)))
                for s, off in offs.items()
            ],
            f"`{source_col}` {src_type}, __soff long, __sstride long, "
            "__scnt long",
        )
        keyed = (
            ranked.join(F.broadcast(sos), source_col)
            .withColumn(
                "__vkey",
                (
                    F.col("__scnt")
                    + (F.col("__nrank") - F.col("__soff"))
                    + F.lit(1)
                )
                * F.col("__sstride"),
            )
            .drop("__soff", "__sstride", "__scnt")
        )
    # >16 sources: closed form would be O(sources) per row — rank the
    # composite with the range exchange instead (identical order)
    positioned = global_index(
        keyed,
        ["__vkey", source_col, id_col],
        out_col=pos_col,
        start=n_old,
    ).drop("__vkey", "__nrank")
    return append_block_aligned(
        positioned, path, pos_col=pos_col, pre_positioned=True
    )


def persist_epoch_layout_versioned(
    df: DataFrame,
    id_col: str,
    epoch: int,
    path: str,
    pos_col: str = "pos",
    max_records_per_file: int | None = None,
) -> str:
    """Multi-epoch operational story (round-13 VERDICT item 3): each
    epoch's layout lives under ``path/ep<epoch>`` and a ``_CURRENT``
    marker names the newest — the IVF-PQ retrain-versioning recipe
    (operators/pq.py ``maintain_ivfpq_index``) applied to the training
    loader. A trainer that resolved epoch N keeps streaming a COMPLETE
    artifact while epoch N+1 is being written; the marker repoint
    (atomic ``os.replace``) is the only visibility switch, and
    :func:`prune_epoch_layouts` bounds retention afterwards. Scheme-
    aware via :mod:`layout_io` — on ``hdfs://``/``s3a://`` the marker
    repoint rides ``FileContext.rename(OVERWRITE)``, the same
    atomicity contract as the local ``os.replace``. Returns the epoch
    directory written."""
    from . import layout_io

    epoch_dir = layout_io.join(path, f"ep{int(epoch)}")
    persist_epoch_layout(
        df,
        id_col,
        epoch,
        epoch_dir,
        pos_col=pos_col,
        max_records_per_file=max_records_per_file,
    )
    layout_io.makedirs(path)
    layout_io.write_text_atomic(path, "_CURRENT", f"ep{int(epoch)}")
    return epoch_dir


def resolve_epoch_layout(path: str, epoch: int | None = None) -> str:
    """The directory a reader should stream: ``path/ep<epoch>`` when a
    specific (retained) epoch is requested — a resume from an older
    checkpoint — else the ``_CURRENT``-marked epoch. Raises on a
    missing epoch or absent marker rather than guessing: a trainer
    reading the wrong permutation is silent data corruption."""
    from . import layout_io

    if epoch is not None:
        d = layout_io.join(path, f"ep{int(epoch)}")
        if not layout_io.isdir(d):
            raise ValueError(
                f"resolve_epoch_layout: no epoch {epoch} under {path} "
                "(pruned or never written)"
            )
        return d
    text = layout_io.read_text(layout_io.join(path, "_CURRENT"))
    if text is None:
        raise ValueError(f"resolve_epoch_layout: no _CURRENT marker in {path}")
    name = text.strip()
    d = layout_io.join(path, name)
    if not name or not layout_io.isdir(d):
        raise ValueError(
            f"resolve_epoch_layout: _CURRENT names {name!r} which is absent"
        )
    return d


def prune_epoch_layouts(path: str, keep: int = 1) -> dict:
    """Bounded retention for :func:`persist_epoch_layout_versioned`:
    delete all but the newest ``keep`` epochs STRICTLY OLDER than the
    ``_CURRENT``-marked one. Never touched: the current epoch itself
    (an in-flight reader may have just resolved it) and any NEWER
    epoch directory (an epoch build in flight — deleting it would race
    the writer mid-copy; its marker repoint has simply not happened
    yet). Same quiesce rule as ``prune_ivfpq_versions``: run once no
    reader can still hold a pre-repoint root. Returns
    ``{"current", "kept", "deleted"}``."""
    from . import layout_io

    cur = resolve_epoch_layout(path).rstrip("/").rsplit("/", 1)[-1]
    cur_n = int(cur[2:])
    epochs = sorted(
        (int(d[2:]), d)
        for d in layout_io.list_names(path)
        if d.startswith("ep")
        and d[2:].isdigit()
        and layout_io.isdir(layout_io.join(path, d))
    )
    preds = [d for n, d in epochs if n < cur_n]
    retained = set(preds[len(preds) - min(len(preds), max(0, int(keep))):])
    deleted = []
    for d in preds:
        if d in retained:
            continue
        layout_io.rmtree(layout_io.join(path, d))
        deleted.append(d)
    # numeric epoch order (preds is already numeric-sorted) — a string
    # sort would file ep10 before ep2 (round-14 review finding)
    kept = [d for d in preds if d in retained] + [cur] + [
        d for n, d in epochs if n > cur_n
    ]
    return {"current": cur, "kept": kept, "deleted": deleted}
