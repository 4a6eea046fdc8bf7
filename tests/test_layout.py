"""Clustered-layout mechanism test: row-group statistics, read straight
from the parquet footers, must become TIGHT under persist_clustered —
that tightness is exactly what lets a pushed filter prune row groups
at scan time. Compared against the arrival-order baseline whose row
groups all span the full value range."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.operators.layout import persist_clustered
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table


def _rowgroup_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` for every row group of every file."""
    ranges = []
    for root, dirs, files in os.walk(path):
        # hidden/metadata sidecars (e.g. _zorder_spec) aren't data files
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, fname)).metadata
            idx = meta.schema.names.index(col)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                ranges.append((st.min, st.max))
    return ranges


def test_clustered_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect() if r["lang"]}
    assert len(langs) >= 2, "fixture needs multiple langs for this test to mean anything"

    base_dir = str(tmp_path / "arrival_order")
    clus_dir = str(tmp_path / "clustered")
    # arrival order, few writers: row groups mix all langs
    docs.coalesce(2).write.parquet(base_dir)
    persist_clustered(docs, clus_dir, ["lang"], n_files=4, max_records_per_file=500)

    base = _rowgroup_ranges(base_dir, "lang")
    clus = _rowgroup_ranges(clus_dir, "lang")
    assert base and clus

    # the pruning semantics, measured directly: a lang='x' filter must
    # read every row group whose [min, max] contains x. Arrival order:
    # that's ALL of them, for every lang. Clustered: at most 2 (the
    # lang's own run + possibly one boundary group straddling adjacent
    # values when a range partition holds two langs).
    def groups_read(ranges, value):
        return sum(1 for mn, mx in ranges if mn <= value <= mx)

    for lang in langs:
        assert groups_read(base, lang) == len(base), "baseline unexpectedly clustered"
        assert groups_read(clus, lang) <= 2, (
            f"lang={lang} still hits {groups_read(clus, lang)}/{len(clus)} row groups"
        )

    # layout is semantics-invisible: same rows back
    a = spark.read.parquet(base_dir).agg(F.sum("doc_id"), F.count("*")).collect()[0]
    b = spark.read.parquet(clus_dir).agg(F.sum("doc_id"), F.count("*")).collect()[0]
    assert tuple(a) == tuple(b)

    # and the pushed filter reaches the clustered scan (the pruning
    # precondition on the query side)
    plan = (
        spark.read.parquet(clus_dir)
        .filter(F.col("lang") == next(iter(langs)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang," in plan


def test_compaction_rewrites_small_files(spark, sf_dir, tmp_path):
    """Many per-trigger files -> few clustered files, losslessly."""
    from pulsar_elasticsearch_sync_rs_spark.operators.layout import compact_clustered

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    frag_dir = str(tmp_path / "fragments")
    # simulate 10 micro-batch writes
    for i in range(10):
        docs.filter(F.col("doc_id") % 10 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(frag_dir)
    n_frag_files = len([f for f in os.listdir(frag_dir) if f.endswith(".parquet")])
    assert n_frag_files == 10

    out_dir = str(tmp_path / "compacted")
    n = compact_clustered(spark, frag_dir, out_dir, ["lang"], target_rows_per_file=10_000)
    n_out_files = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    assert n_out_files < n_frag_files
    assert n == docs.count()
    a = spark.read.parquet(frag_dir).agg(F.sum("doc_id"), F.count("*")).collect()[0]
    b = spark.read.parquet(out_dir).agg(F.sum("doc_id"), F.count("*")).collect()[0]
    assert tuple(a) == tuple(b)
    # compaction also clustered: each lang hits <=2 row groups
    ranges = _rowgroup_ranges(out_dir, "lang")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect() if r["lang"]}
    for lang in langs:
        hits = sum(1 for mn, mx in ranges if mn <= lang <= mx)
        assert hits <= 2, f"lang={lang} hits {hits} row groups post-compaction"


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """persist_partitioned: a filter on the partition column must (1)
    appear as a PartitionFilters entry in the scan (directory-level
    pruning at planning time, before row groups are consulted), (2)
    return exactly the same rows as the unpartitioned read, and (3)
    the layout on disk is one directory per value."""
    from pulsar_elasticsearch_sync_rs_spark.operators.layout import persist_partitioned

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    part_dir = str(tmp_path / "by_lang")
    persist_partitioned(docs.filter(F.col("lang").isNotNull()), part_dir, ["lang"])

    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect() if r["lang"]
    )
    on_disk = sorted(
        e.split("=", 1)[1] for e in os.listdir(part_dir) if e.startswith("lang=")
    )
    assert on_disk == langs, "one directory per partition value"

    scan = spark.read.parquet(part_dir).filter(F.col("lang") == langs[0])
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and f"isnotnull(lang" in plan, plan
    # the partition predicate must be IN PartitionFilters (planning-time
    # directory pruning), not only a data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in pf and langs[0] in pf, f"partition filter not pushed: {pf}"

    want = {r["doc_id"] for r in docs.filter(F.col("lang") == langs[0]).collect()}
    got = {r["doc_id"] for r in scan.collect()}
    assert got == want


def test_bucketed_pair_join_is_shuffle_and_sort_free(spark, sf_dir, tmp_path):
    """SMB co-location: documents and embeddings written bucketed on
    their join keys with the same bucket count must join with ZERO
    Exchange (broadcast disabled to make the claim honest) — the
    recurring fact⋈fact join at 100 TB rides the write-time layout."""
    from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
        bucketed_equi_join,
        persist_bucketed,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    persist_bucketed(docs, "t_docs_b", str(tmp_path / "docs_b"), "doc_id", n_buckets=8)
    persist_bucketed(emb, "t_emb_b", str(tmp_path / "emb_b"), "vec_id", n_buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_equi_join(spark, "t_docs_b", "t_emb_b", "doc_id", "vec_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, f"bucketed pair join must not shuffle:\n{plan}"
            n = joined.count()
            want = docs.join(emb, docs.doc_id == emb.vec_id).count()
            assert n == want and n > 0

            # SAME-named join keys (the corpus ⋈ codes case): the
            # condition must bind per table, not trip the analyzer's
            # ambiguous-reference check
            persist_bucketed(
                emb.withColumnRenamed("vec_id", "doc_id"),
                "t_emb_same",
                str(tmp_path / "emb_same"),
                "doc_id",
                n_buckets=8,
            )
            same = bucketed_equi_join(spark, "t_docs_b", "t_emb_same", "doc_id", "doc_id")
            plan2 = same._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan2
            assert same.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_emb_b")
        spark.sql("DROP TABLE IF EXISTS t_emb_same")


def test_zorder_prunes_on_every_cluster_dimension(spark, sf_dir, tmp_path):
    """The Z-order claim, measured from the parquet footers: a band
    predicate on EITHER cluster column must skip most row groups of
    the z-ordered layout, while (a) arrival order skips none and (b)
    1-D clustering skips only on its leading column. Plus the
    semantics-invisibility and pushdown preconditions, as for the
    1-D test above."""
    from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
        persist_zordered,
        zorder_key,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base_dir = str(tmp_path / "z_arrival")
    one_dir = str(tmp_path / "z_onedim")
    z_dir = str(tmp_path / "z_morton")
    n_rows = ev.count()
    per_file = max(200, n_rows // 32)
    ev.coalesce(2).write.option("maxRecordsPerFile", per_file).parquet(base_dir)
    persist_clustered(ev, one_dir, ["user_id"], n_files=32, max_records_per_file=per_file)
    persist_zordered(ev, z_dir, ["user_id", "event_id"], bits=8, n_files=32,
                     max_records_per_file=per_file)

    # central ~10% band of each dimension, from the data itself
    lo_u, hi_u = ev.approxQuantile("user_id", [0.45, 0.55], 0.0)
    lo_e, hi_e = ev.approxQuantile("event_id", [0.45, 0.55], 0.0)

    def frac_read(path, col, lo, hi):
        ranges = _rowgroup_ranges(path, col)
        hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
        return hit / len(ranges)

    # arrival order: blind on user_id (events arrive in event_id
    # order, so the baseline is incidentally tight on event_id — the
    # 1-D-clustered layout below supplies the blind-on-event_id
    # contrast)
    assert frac_read(base_dir, "user_id", lo_u, hi_u) >= 0.9
    # 1-D clustering: sharp on its key, blind on the other dim
    assert frac_read(one_dir, "user_id", lo_u, hi_u) <= 0.3
    assert frac_read(one_dir, "event_id", lo_e, hi_e) >= 0.9
    # z-order: selective on BOTH dims at once
    zu = frac_read(z_dir, "user_id", lo_u, hi_u)
    ze = frac_read(z_dir, "event_id", lo_e, hi_e)
    assert zu <= 0.6, f"user_id band still reads {zu:.0%} of z-ordered groups"
    assert ze <= 0.6, f"event_id band still reads {ze:.0%} of z-ordered groups"

    # layout is semantics-invisible: same multiset of rows back
    a = spark.read.parquet(base_dir).agg(
        F.count("*"), F.sum("event_id"), F.sum("user_id")).collect()[0]
    z = spark.read.parquet(z_dir).agg(
        F.count("*"), F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(a) == tuple(z)

    # band filters are pushed to the z-ordered scan — INTEGER bounds:
    # a double literal against the bigint column plans as a cast
    # comparison that parquet cannot push (only IsNotNull reaches the
    # scan), silently defeating the row-group pruning the layout buys
    import math

    plan = (
        spark.read.parquet(z_dir)
        .filter(
            (F.col("user_id") >= int(math.ceil(lo_u)))
            & (F.col("user_id") <= int(math.floor(hi_u)))
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), GreaterThanOrEqual(user_id," in plan

    # guardrails: strings refused (hashing kills locality), bit budget
    import pytest

    with pytest.raises(ValueError, match="locality"):
        zorder_key(
            read_table(spark, sf_dir, "documents"), ["lang", "doc_id"]
        )
    with pytest.raises(ValueError, match="63"):
        zorder_key(ev, ["user_id", "event_id"], bits=32)


def test_zorder_key_handles_date_columns(spark, sf_dir):
    """Round-9 ADVICE: DATE does not cast to BIGINT on this Spark build
    (AnalysisException at planning), so date dimensions go through
    unix_date. The key must plan AND order with the calendar: z-ordering
    on a lone date column is exactly its quantile rank, so later dates
    never rank below earlier ones."""
    from pulsar_elasticsearch_sync_rs_spark.operators.layout import zorder_key

    orders = (
        read_table(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("od"), "o_orderkey")
    )
    assert dict(orders.dtypes)["od"] == "date"
    keyed = orders.withColumn("zk", zorder_key(orders, ["od"], bits=6))
    pairs = (
        keyed.groupBy("od").agg(F.min("zk").alias("lo"), F.max("zk").alias("hi"))
        .orderBy("od")
        .collect()
    )
    assert len(pairs) > 3
    # per-date rank is a single cell, and cells are calendar-monotone
    for r in pairs:
        assert r["lo"] == r["hi"]
    ranks = [r["lo"] for r in pairs]
    assert all(a <= b for a, b in zip(ranks, ranks[1:]))
    # mixed date + bigint interleave also plans and evaluates
    two = orders.withColumn("zk", zorder_key(orders, ["od", "o_orderkey"], bits=4))
    assert two.filter(F.col("zk").isNull()).count() == 0


def test_compact_zordered_preserves_morton_layout(spark, sf_dir, tmp_path):
    """Round-10 brief #6: streaming appends erode a Z-ordered table
    (arrival-order files have blind row-group stats); compact_zordered
    rewrites the small files under the SAME persisted cell spec. Pinned
    from the footers: (a) appends degrade the skip rate on both dims,
    (b) compaction restores it to the fresh layout's on BOTH dims,
    (c) rows survive as a multiset, (d) file count is bounded by
    ⌈rows/target⌉, (e) the spec (cut points) carries over byte-identical
    so compactions compose, and (f) a compacted-in-place call refuses."""
    import pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
        compact_zordered,
        load_zorder_spec,
        persist_zordered,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_rows = ev.count()
    per_file = max(200, n_rows // 32)
    z_dir = str(tmp_path / "zc_base")
    # fresh layout from 80% of the data; the remaining 20% arrives later
    old = ev.filter(F.col("event_id") % 5 != 0)
    late = ev.filter(F.col("event_id") % 5 == 0)
    persist_zordered(old, z_dir, ["user_id", "event_id"], bits=8, n_files=32,
                     max_records_per_file=per_file)

    lo_u, hi_u = ev.approxQuantile("user_id", [0.45, 0.55], 0.0)
    lo_e, hi_e = ev.approxQuantile("event_id", [0.45, 0.55], 0.0)

    def frac_read(path, col, lo, hi):
        ranges = _rowgroup_ranges(path, col)
        hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
        return hit / len(ranges)

    fresh_u = frac_read(z_dir, "user_id", lo_u, hi_u)
    fresh_e = frac_read(z_dir, "event_id", lo_e, hi_e)
    assert fresh_u <= 0.6 and fresh_e <= 0.6

    # streaming appends: arrival-order small files — the erosion
    late.coalesce(4).write.option("maxRecordsPerFile", per_file // 4).mode(
        "append"
    ).parquet(z_dir)
    erod_u = frac_read(z_dir, "user_id", lo_u, hi_u)
    assert erod_u > fresh_u, "append must erode the layout for the test to bite"

    dst = str(tmp_path / "zc_compacted")
    # target sized to the fresh layout's granularity (~32 files): the
    # skip-rate comparison is only meaningful at matched row-group
    # grain — fewer, bigger groups each span more z-range regardless of
    # layout quality (in production the grain is the ~128 MB row group,
    # a constant on both sides)
    target = max(1, n_rows // 32)
    wrote = compact_zordered(spark, z_dir, dst, target_rows_per_file=target)
    assert wrote == n_rows
    comp_u = frac_read(dst, "user_id", lo_u, hi_u)
    comp_e = frac_read(dst, "event_id", lo_e, hi_e)
    # restored: selective on BOTH dims again, at the fresh layout's level
    assert comp_u <= fresh_u + 0.1, f"user_id skip not restored: {comp_u:.0%}"
    assert comp_e <= fresh_e + 0.1, f"event_id skip not restored: {comp_e:.0%}"

    # multiset-identical rows
    a = spark.read.parquet(z_dir).agg(
        F.count("*"), F.sum("event_id"), F.sum("user_id")).collect()[0]
    b = spark.read.parquet(dst).agg(
        F.count("*"), F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(a) == tuple(b)

    # file count bounded by ceil(rows/target) (+1 slack for range-
    # partition boundary spill)
    n_files = sum(
        1 for r, d, fs in os.walk(dst)
        if not any(p.startswith("_") for p in r.split(os.sep))
        for f in fs if f.endswith(".parquet")
    )
    assert n_files <= -(-n_rows // target) + 1

    # the spec carried over byte-identical — compactions compose
    assert load_zorder_spec(spark, z_dir) == load_zorder_spec(spark, dst)

    with pytest.raises(ValueError, match="in place"):
        compact_zordered(spark, dst, dst)


def test_persist_zordered_append_reuses_spec(spark, sf_dir, tmp_path):
    """Round-10 review finding: an append must sort under the TABLE's
    persisted cells and leave the spec sidecar untouched — re-deriving
    cut points from the (small, skewed) appended batch would quietly
    redefine the cells most of the data was written under. Drifted
    cluster cols/bits on append raise."""
    import pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
        load_zorder_spec,
        persist_zordered,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    path = str(tmp_path / "z_append")
    old = ev.filter(F.col("event_id") % 4 != 0)
    # a deliberately skewed late batch (top of the id range only)
    cut = ev.approxQuantile("event_id", [0.9], 0.0)[0]
    late = ev.filter((F.col("event_id") % 4 == 0) & (F.col("event_id") >= cut))
    persist_zordered(old, path, ["user_id", "event_id"], bits=6, n_files=8)
    spec_before = load_zorder_spec(spark, path)
    persist_zordered(late, path, ["user_id", "event_id"], bits=6, n_files=2,
                     mode="append")
    assert load_zorder_spec(spark, path) == spec_before, (
        "append overwrote the table spec with batch-local quantiles"
    )
    # rows all present (old 3/4 + the skewed top-decile appendix)
    assert spark.read.parquet(path).count() == old.count() + late.count()
    # drift refused
    with pytest.raises(ValueError, match="different cells|asked"):
        persist_zordered(late, path, ["event_id"], bits=6, mode="append")
    with pytest.raises(ValueError, match="bits"):
        persist_zordered(late, path, ["user_id", "event_id"], bits=4,
                         mode="append")

def test_persist_zordered_append_corrupt_spec_fails_loudly(spark, sf_dir, tmp_path):
    """Round-10 advice: only a genuinely ABSENT sidecar means 'fresh
    directory'. An unreadable/corrupt spec (here: the sidecar directory
    exists but holds no parquet) must raise, not silently re-derive the
    cells from the append batch and overwrite the table spec."""
    import shutil

    import pytest
    from pyspark.errors import AnalysisException

    from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
        persist_zordered,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    path = str(tmp_path / "z_corrupt")
    persist_zordered(ev, path, ["user_id", "event_id"], bits=6, n_files=4)
    # corrupt the sidecar: empty directory → unreadable, not path-missing
    spec_dir = str(tmp_path / "z_corrupt" / "_zorder_spec")
    shutil.rmtree(spec_dir)
    import os
    os.makedirs(spec_dir)
    with pytest.raises(AnalysisException):
        persist_zordered(ev.limit(10), path, ["user_id", "event_id"],
                         bits=6, n_files=1, mode="append")

    # a genuinely fresh directory still works (path-missing is caught)
    fresh = str(tmp_path / "z_fresh")
    persist_zordered(ev.limit(50), fresh, ["user_id", "event_id"], bits=6,
                     n_files=1, mode="append")
    assert spark.read.parquet(fresh).count() == 50
