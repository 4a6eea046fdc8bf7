"""Clustered parquet layout — data organization for scan pruning,
the storage-side half of "push down and prune" at 100 TB.

Predicate pushdown only SKIPS data the file layout lets it skip:
parquet readers prune whole row groups when a pushed filter falls
outside a row group's (min, max) statistics. On a corpus written in
arrival order, every row group spans every language/source/date, the
stats bracket everything, and a ``lang = 'x'`` scan still reads 100%
of the bytes. Clustering the write fixes that — and it's a pure
layout decision, invisible to query semantics.

``persist_clustered`` = ``repartitionByRange(cluster_cols)`` (range
partitioning puts each cluster value in as few output files as
possible) + ``sortWithinPartitions`` (within a file, row groups cover
disjoint runs of the cluster key, so per-row-group min==max for
low-cardinality keys) + ``maxRecordsPerFile`` (bounds file size for
parallel planning). The test (tests/test_layout.py) verifies the
MECHANISM, not vibes: it reads back the parquet footers with pyarrow
and asserts each row group's (min, max) on the cluster column is
tight, versus the arrival-order baseline whose row groups all span
the full value range.

This mirrors the layout discipline of lakehouse table formats
(Hive-style clustering / Delta OPTIMIZE ZORDER's 1-D case) expressed
with stock Spark writers — no table-format dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def is_path_missing(e: Exception) -> bool:
    """True iff an AnalysisException means "this path does not exist"
    — matched on the STRUCTURED error class first (stable across Spark
    versions and JVM locales), with the message substrings as fallback
    for builds predating error classes. Message-only matching is
    version-fragile (round-11 review finding); the absent-path case is
    the ONLY one the sidecar/tombstone readers may treat as silent."""
    ec = None
    for probe in ("getCondition", "getErrorClass"):  # 4.x name, 3.x name
        fn = getattr(e, probe, None)
        if fn is not None:
            try:
                ec = fn()
                break
            except Exception:
                pass
    if ec and "PATH_NOT_FOUND" in ec:
        return True
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def persist_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``: range
    partitioned across ``n_files`` writers and sorted within each, so
    row-group min/max stats on the cluster columns are tight and a
    pushed equality/range filter prunes whole row groups at read time.
    """
    if not cluster_cols:
        raise ValueError("cluster_cols must name at least one column")
    writer = (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def _same_location(spark, a: str, b: str) -> bool:
    """True when two path strings name the SAME storage location after
    Hadoop qualification — ``file:///tmp/x`` vs ``/tmp/x`` vs a relative
    spelling, on ANY Hadoop filesystem (os.path.realpath is meaningless
    for hdfs:// or s3a:// URIs and misses scheme-qualified twins)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = []
    for p in (a, b):
        hp = jvm.org.apache.hadoop.fs.Path(p)
        out.append(str(hp.getFileSystem(conf).makeQualified(hp)))
    return out[0] == out[1]


def compact_clustered(
    spark,
    src_path: str,
    dst_path: str,
    cluster_cols: list[str],
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Compact a directory of small parquet files (the natural output
    of a streaming sink's per-trigger writes) into size-bounded files
    that are ALSO clustered on ``cluster_cols`` — one rewrite pass
    fixes both the small-file problem and the row-group stats. Returns
    the row count written. Sizing: ⌈rows / target⌉ range partitions,
    so output file count tracks data volume, not trigger count."""
    if _same_location(spark, src_path, dst_path):
        raise ValueError(
            "compact_clustered cannot run in place: the overwrite write would "
            "delete the source while it is still being lazily read — "
            "compact to a new path, then swap directories"
        )
    df = spark.read.parquet(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    persist_clustered(
        df,
        dst_path,
        cluster_cols,
        n_files=n_files,
        max_records_per_file=target_rows_per_file,
    )
    return n_rows


def persist_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``write.partitionBy``):
    one directory per partition value. Complements the row-group
    clustering above at the COARSER granularity — a filter on a
    partition column prunes whole DIRECTORIES at planning time
    (``PartitionFilters`` in the scan, zero files listed for excluded
    values), before row-group stats are even consulted. The standard
    time-partitioning discipline for a 100 TB event table: partition
    by date (bounded cardinality), cluster within partitions by the
    hot filter key. Keep partition cardinality bounded — a
    high-cardinality partition column creates millions of tiny
    directories and kills the file index."""
    if not partition_cols:
        raise ValueError("partition_cols must name at least one column")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def persist_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Write ``df`` as a Spark-native bucketed+sorted table on ``key``
    — the SMB (sort-merge-bucket) building block. TWO tables written
    with the SAME bucket count on their join keys co-locate: the join
    needs no Exchange and no Sort on either side (asserted in
    tests/test_layout.py). At 100 TB this turns the recurring
    fact⋈fact join (documents ⋈ embeddings, corpus ⋈ codes) from a
    full double shuffle into a per-bucket merge — the bucketing cost
    is paid once at write time."""
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table_name)
    )


def _zorder_casts(df: DataFrame, cluster_cols: list[str], bits: int):
    """Validate the cluster columns and build their double-typed cast
    expressions (shared by the key UDF and the quantile pass)."""
    from pyspark.sql import functions as F

    if not cluster_cols:
        raise ValueError("cluster_cols must name at least one column")
    n_cols = len(cluster_cols)
    if bits < 1 or bits * n_cols > 63:
        raise ValueError(
            f"bits ({bits}) x columns ({n_cols}) must stay within a signed "
            "long (<= 63 interleaved bits)"
        )
    dtypes = dict(df.dtypes)
    casts = []
    for c in cluster_cols:
        t = dtypes[c]
        if t == "date":
            # DATE does not cast to BIGINT on this Spark build
            # (AnalysisException); unix_date gives days-since-epoch
            casts.append(F.unix_date(F.col(c)).cast("double").alias(c))
        elif t == "boolean" or t.startswith("timestamp"):
            casts.append(F.col(c).cast("long").cast("double").alias(c))
        elif t in ("tinyint", "smallint", "int", "bigint", "float",
                   "double") or t.startswith("decimal"):
            casts.append(F.col(c).cast("double").alias(c))
        else:
            raise ValueError(
                f"zorder_key: column {c!r} has type {t}; z-ordering needs an "
                "ordered numeric/temporal dimension (hashing a string would "
                "discard the locality the layout exists to create)"
            )
    return casts


def zorder_bounds(df: DataFrame, cluster_cols: list[str], bits: int = 8,
                  relative_error: float = 0.001):
    """The quantile cut points (``2^bits − 1`` per column, as
    float64 arrays) the Morton key ranks against — the ONLY driver
    state of the layout, a few KB. Exposed so :func:`persist_zordered`
    can persist them beside the data and :func:`compact_zordered` can
    rewrite small files under the SAME cell boundaries without
    re-scanning for quantiles."""
    import numpy as np

    casts = _zorder_casts(df, cluster_cols, bits)
    probs = [i / float(1 << bits) for i in range(1, 1 << bits)]
    out = []
    empty_checked = None
    for c, b in zip(
        cluster_cols,
        df.select(*casts).approxQuantile(cluster_cols, probs, relative_error),
    ):
        if len(b) == 0:
            # approxQuantile returns no cut points for an EMPTY corpus
            # (totality: substitute a degenerate spec, zero rows rank
            # into one cell) — but ALSO for an all-NULL column on real
            # data, where a silently-degenerate persisted spec would
            # collapse every future skip rate to zero. Distinguish the
            # two (round-10 review finding).
            if empty_checked is None:
                empty_checked = df.isEmpty()
            if not empty_checked:
                raise ValueError(
                    f"zorder_bounds: column {c!r} has no quantiles on a "
                    "non-empty corpus (all NULL?) — a degenerate layout "
                    "spec would silently disable pruning; filter or pick "
                    "another dimension"
                )
            b = [0.0] * len(probs)
        out.append(np.asarray(b, dtype=np.float64))
    return out


def zorder_key(df: DataFrame, cluster_cols: list[str], bits: int = 8,
               relative_error: float = 0.001, bounds=None):
    """Column expression: the Morton (Z-order) key of ``cluster_cols``
    — the multi-column generalization of :func:`persist_clustered`'s
    1-D sort. Sorting by an interleaved-bit key keeps rows that are
    close in EVERY cluster dimension close in the file order, so
    row-group min/max stats become selective on ALL the columns at
    once instead of only the leading sort key (Delta/Iceberg's
    OPTIMIZE ZORDER discipline, expressed with stock Spark).

    Mechanics: one `approxQuantile` pass computes ``2^bits − 1``
    cut points per column (driver-side, ≤ a few KB — the only
    collected state), then a vectorized Arrow pandas UDF maps each
    value to its quantile rank via ``np.searchsorted`` and interleaves
    the rank bits. Quantile ranks rather than min/max scaling make the
    key skew-proof: each of the ``2^bits`` cells along a dimension
    holds ~equal row count whatever the value distribution. Only the
    cluster columns cross the Python boundary; at 100 TB the pass is
    one extra narrow map over the write path.

    Numeric / date / timestamp / boolean columns only: hashing would
    admit strings but destroys the locality that IS the point — raise
    instead so the caller picks a meaningful dimension. Nulls (and
    int64 precision beyond 2^53, coarsened by the float64 rank space)
    land in the top cell — a layout heuristic, never semantics.
    ``bits × len(cluster_cols)`` must fit a signed long (≤ 63).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_cols = len(cluster_cols)
    casts = _zorder_casts(df, cluster_cols, bits)
    # a degenerate column (constant / heavy ties) may yield repeated cut
    # points — searchsorted(side="right") can then rank ties past the
    # last cell, clipped inside the UDF. ``bounds`` short-circuits the
    # quantile pass with a PERSISTED spec (compact_zordered): cell
    # boundaries stay stable across appends/compactions and the rewrite
    # never re-scans for quantiles.
    if bounds is None:
        bounds = zorder_bounds(df, cluster_cols, bits, relative_error)
    else:
        bounds = [np.asarray(b, dtype=np.float64) for b in bounds]
        if len(bounds) != n_cols or any(
            len(b) != (1 << bits) - 1 for b in bounds
        ):
            raise ValueError(
                f"zorder_key: supplied bounds do not match {n_cols} columns "
                f"x {(1 << bits) - 1} cut points (bits={bits})"
            )

    # no signature type hints: PySpark's hint inference rejects a
    # varargs (*series) pandas signature; the explicit returnType rules
    @F.pandas_udf(T.LongType())
    def _zkey(*series):
        n = len(series[0])
        out = np.zeros(n, dtype=np.uint64)
        for j, (s, bnd) in enumerate(zip(series, bounds)):
            v = s.to_numpy(dtype=np.float64, na_value=np.inf)
            rank = np.searchsorted(bnd, v, side="right").astype(np.uint64)
            np.clip(rank, 0, (1 << bits) - 1, out=rank)
            for bit in range(bits):
                out |= ((rank >> np.uint64(bit)) & np.uint64(1)) << np.uint64(
                    bit * len(series) + j
                )
        return pd.Series(out.astype(np.int64))

    return _zkey(*casts)


def persist_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    write_spec: bool = True,
) -> None:
    """Write ``df`` as parquet Z-ordered on ``cluster_cols``: range
    partition on the Morton key (each output file owns a contiguous
    z-range = a compact region of the multi-dim space), sort within,
    drop the key. A pushed filter on ANY of the cluster columns then
    prunes the files/row groups whose region misses the predicate —
    the layout-side complement to predicate pushdown that 1-D
    clustering only provides for its leading column. The key UDF is
    evaluated in the exchange stage only (it never reaches the files).

    ``write_spec`` (default True) persists the layout spec — cluster
    columns, bits, and the quantile cut points — as a one-file parquet
    sidecar under ``path/_zorder_spec`` (underscore-prefixed: invisible
    to parquet readers of ``path``; written through the Spark writer so
    it lands on the same filesystem as the data for any Hadoop path).
    :func:`compact_zordered` reads it back, so small-file compaction
    under streaming appends preserves the SAME cell boundaries without
    re-scanning for quantiles.

    ``mode="append"`` onto a directory that already carries a spec
    REUSES that spec's cut points (and leaves the sidecar untouched):
    the appended batch sorts under the TABLE's cells, not its own
    batch-skewed quantiles — re-deriving and overwriting the spec from
    a small append would quietly redefine the cells most of the data
    was written under (round-10 review finding). A spec with different
    columns/bits is a drift error, raised loudly.
    """
    bounds = None
    spec_exists = False
    if mode == "append" and write_spec:
        from pyspark.errors import AnalysisException

        try:
            prev_cols, prev_bits, prev_bounds = load_zorder_spec(
                df.sparkSession, path
            )
            spec_exists = True
        except AnalysisException as e:
            # Only a genuinely absent sidecar means "fresh directory".
            # A corrupt/unreadable spec or a transient FS error must
            # fail loudly — silently re-deriving cells from the (often
            # skewed) append batch and overwriting the table spec is
            # the quiet-cell-redefinition this function raises for on
            # explicit drift (round-10 advice).
            if not is_path_missing(e):
                raise
            # fresh directory: compute + write below
        if spec_exists:
            if list(prev_cols) != list(cluster_cols) or int(prev_bits) != int(bits):
                raise ValueError(
                    f"persist_zordered(append): existing spec at {path} is "
                    f"({prev_cols}, bits={prev_bits}) but this write asked "
                    f"for ({list(cluster_cols)}, bits={bits}) — appending "
                    "under different cells would corrupt the layout contract"
                )
            bounds = prev_bounds
    if bounds is None:
        bounds = zorder_bounds(df, cluster_cols, bits=bits)
    zdf = df.withColumn(
        "__zkey", zorder_key(df, cluster_cols, bits=bits, bounds=bounds)
    )
    writer = (
        zdf.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    if write_spec and not spec_exists:
        _write_zorder_spec(df.sparkSession, path, cluster_cols, bits, bounds)


def _write_zorder_spec(spark, path: str, cluster_cols, bits: int, bounds) -> None:
    import json
    import posixpath

    spec = {
        "cluster_cols": list(cluster_cols),
        "bits": int(bits),
        "bounds": [[float(x) for x in b] for b in bounds],
    }
    (
        spark.createDataFrame([(json.dumps(spec),)], "spec string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(posixpath.join(path, "_zorder_spec"))
    )


def load_zorder_spec(spark, path: str):
    """Read back the layout spec :func:`persist_zordered` wrote beside
    the data. Returns ``(cluster_cols, bits, bounds)``."""
    import json
    import posixpath

    row = spark.read.parquet(posixpath.join(path, "_zorder_spec")).first()
    if row is None:
        raise ValueError(f"no z-order spec found under {path}")
    spec = json.loads(row["spec"])
    return spec["cluster_cols"], spec["bits"], spec["bounds"]


def compact_zordered(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Z-order-preserving small-file compaction — the streaming-append
    repair pass :func:`compact_clustered` provides for 1-D layouts,
    which would otherwise ERODE a Morton layout (it re-clusters on one
    leading column). Reads the spec sidecar (columns, bits, CUT POINTS)
    from ``src_path``, re-sorts every row under the SAME Morton cells,
    and writes ⌈rows / target⌉ size-bounded files plus the carried-over
    spec — footer skip rates return to the freshly-written layout's and
    later compactions keep composing (the spec, not the data, defines
    the cells). Returns the row count written.

    Scale: NO quantile re-scan (the persisted cut points are reused —
    on a 100 TB table the approxQuantile pass is the only other
    full-data term), one range exchange + narrow Arrow key map — the
    same cost profile as the original write."""
    if _same_location(spark, src_path, dst_path):
        raise ValueError(
            "compact_zordered cannot run in place: the overwrite write would "
            "delete the source while it is still being lazily read — "
            "compact to a new path, then swap directories"
        )
    cluster_cols, bits, bounds = load_zorder_spec(spark, src_path)
    df = spark.read.parquet(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    zdf = df.withColumn(
        "__zkey", zorder_key(df, cluster_cols, bits=bits, bounds=bounds)
    )
    (
        zdf.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(dst_path)
    )
    _write_zorder_spec(spark, dst_path, cluster_cols, bits, bounds)
    return n_rows


def bucketed_equi_join(spark, table_a: str, table_b: str, key_a: str, key_b: str):
    """Join two :func:`persist_bucketed` tables on their bucket keys.
    Declarative — Catalyst recognizes both sides' bucket layout
    satisfies the join distribution and plans a shuffle-free SMJ.
    The condition binds each key to ITS table, so same-named keys on
    both sides (the common corpus ⋈ codes case) don't trip the
    analyzer's ambiguous-reference check."""
    a = spark.table(table_a)
    b = spark.table(table_b)
    return a.join(b, a[key_a] == b[key_b])
