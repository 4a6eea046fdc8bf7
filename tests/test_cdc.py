"""SCD2 CDC merge semantics (operators/cdc.scd2_apply): every edge of
the per-key change-application contract, pinned on a hand-built batch,
plus the plan-shape claim that the base snapshot is never shuffled —
the property that makes the merge viable when base is 100 TB and the
change batch is megabytes."""

from __future__ import annotations

import datetime as dt
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_apply

T0 = dt.datetime(2020, 1, 1)
T1 = dt.datetime(2021, 1, 1)
T2 = dt.datetime(2022, 1, 1)
T3 = dt.datetime(2023, 1, 1)


def _base(spark):
    # k=1: history + open version   k=2: open, untouched by changes
    # k=3: open, will be deleted    k=4: open, multi-change key
    rows = [
        (1, 10.0, dt.datetime(2019, 1, 1), T0, False),
        (1, 11.0, T0, None, True),
        (2, 20.0, T0, None, True),
        (3, 30.0, T0, None, True),
        (4, 40.0, T0, None, True),
    ]
    return spark.createDataFrame(
        rows, "k int, v double, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def _changes(spark):
    # k=1: single update        k=3: delete
    # k=4: update, delete, re-insert (3 changes, ordered)
    # k=5: insert of a brand-new key
    rows = [
        (1, 12.0, "U", T1),
        (3, 0.0, "D", T1),
        (4, 41.0, "U", T1),
        (4, 0.0, "D", T2),
        (4, 42.0, "I", T3),
        (5, 50.0, "I", T2),
    ]
    return spark.createDataFrame(rows, "k int, v double, op string, ts timestamp")


def test_scd2_apply_versions_and_intervals(spark):
    out = scd2_apply(_base(spark), _changes(spark), key="k", attrs=["v"])
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    want = {
        # k=1: old history untouched; open version closed at T1; new open
        (1, 10.0, dt.datetime(2019, 1, 1), T0, False),
        (1, 11.0, T0, T1, False),
        (1, 12.0, T1, None, True),
        # k=2 untouched
        (2, 20.0, T0, None, True),
        # k=3: deleted — closed at T1, nothing opened
        (3, 30.0, T0, T1, False),
        # k=4: closed at T1; U version [T1,T2) closed by the D; the D
        # opens nothing; re-insert open from T3
        (4, 40.0, T0, T1, False),
        (4, 41.0, T1, T2, False),
        (4, 42.0, T3, None, True),
        # k=5 brand new
        (5, 50.0, T2, None, True),
    }
    assert got == want
    # exactly one open version per surviving key
    open_counts = dict(
        (r.k, r.n)
        for r in out.filter("is_current").groupBy("k").agg(F.count("*").alias("n")).collect()
    )
    assert open_counts == {1: 1, 2: 1, 4: 1, 5: 1}


def test_scd2_apply_base_side_joins_are_broadcast(spark):
    out = scd2_apply(_base(spark), _changes(spark), key="k", attrs=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # optimization round 15: ONE base pass for all three row fates —
    # error mode is exactly three broadcast hash joins (the fused
    # close/untouched/history left probe, the orphan guard's semi
    # probe of the open-version set, and the orphan probe's left join
    # against the tiny present-key set); base is never exchanged, and
    # base must appear in exactly TWO scans (the fused pass + the
    # orphan probe), down from four union branches
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    base_scans = [
        ln
        for ln in plan.splitlines()
        if "Scan ExistingRDD" in ln and "valid_from" in ln
    ]
    assert len(base_scans) == 2, plan
    # the caller-guaranteed fast path is ONE broadcast join over ONE
    # base scan
    fast = scd2_apply(
        _base(spark), _changes(spark), key="k", attrs=["v"], on_late="ignore"
    )
    fplan = fast._jdf.queryExecution().executedPlan().toString()
    assert fplan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in fplan


def test_scd2_apply_partitioned_rewrites_only_changed_buckets(spark, sf_dir, tmp_path):
    """Copy-on-write merge grain: (a) results ≡ the DataFrame-level
    scd2_apply over the full snapshot, (b) untouched bucket directories
    are byte-untouched (file list + mtimes), (c) the base read prunes
    unchanged buckets at PLANNING time (PartitionFilters), (d) an empty
    change batch is a no-op."""
    import os

    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import (
        persist_scd2_partitioned,
        scd2_apply_partitioned,
    )
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    cust = read_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("v"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    base_dir = str(tmp_path / "scd2_base")
    n_parts = 8
    persist_scd2_partitioned(base, base_dir, "k", n_parts=n_parts)

    # changes touch only a few keys → a strict subset of buckets
    keys = [r["k"] for r in base.select("k").orderBy("k").limit(3).collect()]
    ch = spark.createDataFrame(
        [(int(k), float(i), "U", T1) for i, k in enumerate(keys)]
        + [(10**9 + 7, 99.0, "I", T2)],  # brand-new key
        "k bigint, v double, op string, ts timestamp",
    )

    def dir_state(pb):
        d = os.path.join(base_dir, f"pb={pb}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith(".")
        )

    # expected = DataFrame-level apply over the FULL snapshot
    want = {
        tuple(r)
        for r in scd2_apply(
            spark.read.parquet(base_dir).select(
                "k", "v", "valid_from", "valid_to", "is_current"
            ),
            ch,
            key="k",
            attrs=["v"],
        ).collect()
    }

    all_pb = set(range(n_parts))
    pre = {pb: dir_state(pb) for pb in all_pb}  # BEFORE the merge
    rep = scd2_apply_partitioned(
        spark, base_dir, ch, key="k", attrs=["v"], n_parts=n_parts
    )
    changed = set(rep["changed_buckets"])
    assert changed and changed < all_pb, "fixture must leave some buckets untouched"
    untouched = sorted(all_pb - changed)

    got = {
        tuple(r)
        for r in spark.read.parquet(base_dir)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    }
    assert got == want
    for pb in untouched:
        assert dir_state(pb) == pre[pb], f"bucket {pb} was rewritten"

    # planning-time pruning of the base read
    plan = (
        spark.read.parquet(base_dir)
        .filter(F.col("pb").isin(sorted(changed)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "pb" in plan.split("PartitionFilters:")[1][:80], (
        "the pb IN (...) predicate must prune directories at planning time"
    )

    # empty change batch: no-op
    empty = ch.limit(0)
    rep0 = scd2_apply_partitioned(
        spark, base_dir, empty, key="k", attrs=["v"], n_parts=n_parts
    )
    assert rep0 == {
        "changed_buckets": [],
        "rows_written": 0,
        "orphan_tombstones_by_bucket": {},
        "orphan_tombstones_pre_by_bucket": {},
    }


def test_scd2_partitioned_change_key_dtype_mismatch_is_safe(spark, tmp_path):
    """Round-9 ADVICE: xxhash64 is TYPE-sensitive (xxhash64(5::int) !=
    xxhash64(5::bigint)), so a change batch whose key arrives as INT
    against a BIGINT base must be cast to the base dtype BEFORE the
    changed-bucket set is derived — otherwise the wrong partitions are
    rewritten and a key ends up with two open versions (silent
    corruption)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import (
        persist_scd2_partitioned,
        scd2_apply_partitioned,
    )

    base = spark.createDataFrame(
        [(int(k), 1.0, T0, None, True) for k in range(40)],
        "k bigint, v double, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    base_dir = str(tmp_path / "scd2_dtype")
    persist_scd2_partitioned(base, base_dir, "k", n_parts=16)

    # INT-typed change key — e.g. 5: pmod(xxhash64(5::int),16)=8 but the
    # base row lives in pmod(xxhash64(5::bigint),16)=5
    ch = spark.createDataFrame(
        [(5, 2.0, "U", T1), (7, 3.0, "U", T1)],
        "k int, v double, op string, ts timestamp",
    )
    scd2_apply_partitioned(spark, base_dir, ch, key="k", attrs=["v"], n_parts=16)

    snap = spark.read.parquet(base_dir)
    cur = {
        r.k: (r.v, r.valid_from)
        for r in snap.filter("is_current").collect()
    }
    # exactly one open version per key, updates applied
    assert len(cur) == 40
    assert cur[5] == (2.0, T1) and cur[7] == (3.0, T1)
    # the old open versions were CLOSED (no duplicate-current corruption)
    closed = snap.filter(~F.col("is_current")).collect()
    assert {(r.k, r.valid_to) for r in closed} == {(5, T1), (7, T1)}
    assert snap.count() == 42


def test_scd2_asof_multi_batch_partitioned(spark, tmp_path):
    """Round-10 brief #4: SCD2 time travel over a snapshot built by
    THREE successive partitioned merges (repeated bucket rewrites — the
    copy-on-write path exercised beyond one application). Each as-of
    point is oracled against a DuckDB interval query over the final
    snapshot, and the alive-set semantics (exactly one version per
    alive key; deleted keys absent; later-born keys absent) are pinned
    directly."""
    import duckdb

    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import (
        persist_scd2_partitioned,
        scd2_apply_partitioned,
        scd2_as_of,
    )

    base = spark.createDataFrame(
        [(int(k), 0.0, T0, None, True) for k in range(30)],
        "k bigint, v double, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    base_dir = str(tmp_path / "scd2_tt")
    persist_scd2_partitioned(base, base_dir, "k", n_parts=8)

    batches = [
        # T1: update 0..9, delete 10..14
        [(k, 1.0, "U", T1) for k in range(10)]
        + [(k, 0.0, "D", T1) for k in range(10, 15)],
        # T2: update 5..9 again, insert brand-new 100..104
        [(k, 2.0, "U", T2) for k in range(5, 10)]
        + [(k, 9.0, "I", T2) for k in range(100, 105)],
        # T3: delete 0..2, re-insert 10 (deleted at T1)
        [(k, 0.0, "D", T3) for k in range(3)] + [(10, 3.0, "I", T3)],
    ]
    for b in batches:
        ch = spark.createDataFrame(
            [(int(k), float(v), op, ts) for k, v, op, ts in b],
            "k bigint, v double, op string, ts timestamp",
        )
        scd2_apply_partitioned(spark, base_dir, ch, key="k", attrs=["v"], n_parts=8)

    snap = spark.read.parquet(base_dir).select(
        "k", "v", "valid_from", "valid_to", "is_current"
    )
    snap_pdf = snap.toPandas()
    con = duckdb.connect()
    con.register("snap", snap_pdf)

    mid = dt.datetime(2020, 7, 1)  # between T0 and T1
    for point, want_alive in [
        (mid, 30),                # all base keys, pre-change values
        (T1, 25),                 # 10..14 deleted at T1 (closed AT T1)
        (T2, 30),                 # +5 inserts at T2
        (T3, 28),                 # -3 deletes, +1 re-insert at T3
    ]:
        got = scd2_as_of(snap, point).select("k", "v").collect()
        want = con.execute(
            "SELECT k, v FROM snap WHERE valid_from <= ? "
            "AND (valid_to IS NULL OR valid_to > ?)",
            [point, point],
        ).fetchall()
        assert sorted((r.k, r.v) for r in got) == sorted(want)
        assert len(got) == want_alive, f"as-of {point}"
        # one version per alive key — the interval-partition contract
        assert len({r.k for r in got}) == len(got)

    # spot semantics: key 7 walks 0.0 -> 1.0 -> 2.0 across the horizon
    walk = {
        p: {r.k: r.v for r in scd2_as_of(snap, p).collect()}.get(7)
        for p in (mid, T1, T2)
    }
    assert walk == {mid: 0.0, T1: 1.0, T2: 2.0}
    # deleted-then-reborn key 10: absent at T2, back at T3 with v=3.0
    assert 10 not in {r.k for r in scd2_as_of(snap, T2).collect()}
    assert {r.k: r.v for r in scd2_as_of(snap, T3).collect()}[10] == 3.0


def test_scd2_diff_classifies_churn(spark):
    """scd2_diff over a hand-built snapshot: added / removed / changed
    classification, unchanged keys absent, attrs null-safe (a null→null
    attr is NOT a change; null→value is)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import (
        scd2_apply,
        scd2_diff,
    )

    snap = scd2_apply(_base(spark), _changes(spark), key="k", attrs=["v"])
    out = {
        (r.k, r.change, r.old_v, r.new_v)
        for r in scd2_diff(
            snap, dt.datetime(2020, 6, 1), dt.datetime(2022, 6, 1),
            key="k", attrs=["v"],
        ).collect()
    }
    # between T0+ and T2+: k=1 11->12 changed, k=3 deleted (removed),
    # k=4 open 40 -> deleted at T2 (removed), k=5 inserted at T2 (added);
    # k=2 untouched -> absent
    assert out == {
        (1, "changed", 11.0, 12.0),
        (3, "removed", 30.0, None),
        (4, "removed", 40.0, None),
        (5, "added", None, 50.0),
    }
    # null-safe: same ts twice -> empty diff
    assert (
        scd2_diff(snap, T1, T1, key="k", attrs=["v"]).count() == 0
    )


def test_scd2_apply_out_of_order_raises(spark):
    """Round-10 verdict #1: the ordered-log precondition is now
    ENFORCED (on_late='error', the default). A change ts that predates
    the open version's valid_from — or, for a deleted key, lands inside
    closed history — raises at execution with the offending key instead
    of silently writing overlapping/inverted intervals."""
    import pytest

    base = _base(spark)
    # ts before every open version's valid_from (T0)
    late = spark.createDataFrame(
        [(1, 99.0, "U", dt.datetime(2019, 6, 1))],
        "k int, v double, op string, ts timestamp",
    )
    with pytest.raises(Exception, match="out-of-order"):
        scd2_apply(base, late, key="k", attrs=["v"]).collect()

    # deleted-key variant: k=3 is deleted at T1 in this snapshot; an
    # insert strictly inside the closed interval must also raise
    snap = scd2_apply(base, _changes(spark), key="k", attrs=["v"])
    snap = snap.localCheckpoint(eager=True)
    inside = spark.createDataFrame(
        [(3, 77.0, "I", dt.datetime(2020, 6, 1))],
        "k int, v double, op string, ts timestamp",
    )
    with pytest.raises(Exception, match="closed history"):
        scd2_apply(snap, inside, key="k", attrs=["v"]).collect()

    # a re-insert AT or AFTER the delete boundary is in-order: fine
    at_boundary = spark.createDataFrame(
        [(3, 77.0, "I", T1)], "k int, v double, op string, ts timestamp"
    )
    out = scd2_apply(snap, at_boundary, key="k", attrs=["v"]).collect()
    assert (3, 77.0, T1, None, True) in {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out
    }

    # 'ignore' restores the caller-guaranteed fast path (no guard)
    assert scd2_apply(base, late, key="k", attrs=["v"], on_late="ignore").count() > 0
    with pytest.raises(ValueError, match="on_late"):
        scd2_apply(base, late, key="k", attrs=["v"], on_late="bogus")


def test_scd2_apply_splice_equals_sequential(spark):
    """on_late='splice' retro-merges a late batch so the snapshot
    equals what a chronologically-ordered replay would have produced —
    pinned here on the hand-built fixture by applying the T2/T3 changes
    FIRST, then splicing the T1 batch in, and comparing multisets with
    the one-shot ordered apply."""
    from collections import Counter

    base = _base(spark)
    all_changes = _changes(spark)
    want = Counter(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(base, all_changes, key="k", attrs=["v"]).collect()
    )

    first = all_changes.filter(F.col("ts") > T1)   # T2/T3 rows
    late = all_changes.filter(F.col("ts") == T1)   # the late batch
    snap = scd2_apply(base, first, key="k", attrs=["v"]).localCheckpoint(
        eager=True
    )
    spliced = scd2_apply(snap, late, key="k", attrs=["v"], on_late="splice")
    got = Counter(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in spliced.collect()
    )
    assert got == want

    # splice keeps exactly one open version per surviving key
    open_counts = (
        spliced.filter("is_current").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_splice_inside_deleted_interval(spark):
    """A late insert strictly inside a deleted key's closed interval
    splices to [insert_ts, delete_ts) — exactly the sequential replay
    I(ts) before D(delete_ts)."""
    base = _base(spark)
    snap = scd2_apply(base, _changes(spark), key="k", attrs=["v"])
    snap = snap.localCheckpoint(eager=True)
    mid = dt.datetime(2020, 6, 1)
    inside = spark.createDataFrame(
        [(3, 77.0, "I", mid)], "k int, v double, op string, ts timestamp"
    )
    out = scd2_apply(snap, inside, key="k", attrs=["v"], on_late="splice")
    k3 = {
        (r.v, r.valid_from, r.valid_to, r.is_current)
        for r in out.filter("k = 3").collect()
    }
    assert k3 == {
        (30.0, T0, mid, False),
        (77.0, mid, T1, False),  # still closed by the original delete
    }


def test_scd2_splice_orphan_delete_tombstone(spark):
    """The shuffled-order Hypothesis test's falsifying case, pinned
    deterministically: a delete that arrives BEFORE its key's insert
    must not vanish from the snapshot — it persists as a zero-length
    tombstone [ts, ts) (null attrs, not current, invisible to as-of),
    and when the earlier insert later splices in, the pair rebuilds to
    the chronological [insert_ts, delete_ts) closed version."""
    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_as_of

    empty = spark.createDataFrame(
        [], "k int, v double, valid_from timestamp, valid_to timestamp, is_current boolean"
    )
    d_first = spark.createDataFrame(
        [(4, 0.0, "D", dt.datetime(2020, 1, 9))],
        "k int, v double, op string, ts timestamp",
    )
    snap = scd2_apply(
        empty, d_first, key="k", attrs=["v"], on_late="splice"
    ).localCheckpoint(eager=True)
    rows = [
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in snap.collect()
    ]
    t9 = dt.datetime(2020, 1, 9)
    assert rows == [(4, None, t9, t9, False)], rows
    # invisible to time travel at (and around) its instant
    assert scd2_as_of(snap, t9).count() == 0

    late_insert = spark.createDataFrame(
        [(4, 7.0, "I", dt.datetime(2020, 1, 2))],
        "k int, v double, op string, ts timestamp",
    )
    snap2 = scd2_apply(snap, late_insert, key="k", attrs=["v"], on_late="splice")
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in snap2.collect()
    }
    assert got == {(4, 7.0, dt.datetime(2020, 1, 2), t9, False)}, got


def test_scd2_apply_orphan_delete_raises(spark):
    """Round-11 ADVICE (medium): in error mode a 'D' for a key ABSENT
    from the snapshot is the D-before-I arrival — previously it left no
    trace (no base row for either boundary guard to ride, the opened
    branch filters 'D' out), so a later earlier-ts insert resurrected
    the key as open-forever. Now it raises at execution; splice mode
    keeps handling it via tombstones."""
    import pytest

    base = _base(spark)
    # cross-batch orphan: D for key 9, no snapshot row
    orphan = spark.createDataFrame(
        [(9, 0.0, "D", T1)], "k int, v double, op string, ts timestamp"
    )
    with pytest.raises(Exception, match="no open version"):
        scd2_apply(base, orphan, key="k", attrs=["v"]).collect()
    # this guard rides a FILTER, so unlike the column-borne boundary
    # guards it fires on EVERY action — a bare count() and a
    # projection that drops the validity columns both raise (and can
    # never leak a phantom orphan row into the result)
    with pytest.raises(Exception, match="no open version"):
        scd2_apply(base, orphan, key="k", attrs=["v"]).count()
    with pytest.raises(Exception, match="no open version"):
        scd2_apply(base, orphan, key="k", attrs=["v"]).select("k").count()

    # within-batch D-before-I is the same orphan class (the delete's
    # insert never arrived) and must also raise
    dbi = spark.createDataFrame(
        [(9, 0.0, "D", T1), (9, 90.0, "I", T2)],
        "k int, v double, op string, ts timestamp",
    )
    with pytest.raises(Exception, match="no open version"):
        scd2_apply(base, dbi, key="k", attrs=["v"]).collect()

    # ordered I-then-D on a brand-new key stays legal: one closed version
    itd = spark.createDataFrame(
        [(9, 90.0, "I", T1), (9, 0.0, "D", T2)],
        "k int, v double, op string, ts timestamp",
    )
    k9 = {
        (r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(base, itd, key="k", attrs=["v"])
        .filter("k = 9")
        .collect()
    }
    assert k9 == {(90.0, T1, T2, False)}

    # a leading 'D' on an EXISTING key is the normal close — no raise
    # (k=3 in the main fixture already covers this; re-pin it next to
    # the guard so a regression points here)
    dd = spark.createDataFrame(
        [(3, 0.0, "D", T1)], "k int, v double, op string, ts timestamp"
    )
    k3 = {
        (r.v, r.valid_to, r.is_current)
        for r in scd2_apply(base, dd, key="k", attrs=["v"])
        .filter("k = 3")
        .collect()
    }
    assert k3 == {(30.0, T1, False)}

    # splice mode still persists the orphan as a zero-length tombstone
    # rather than raising (test_scd2_splice_orphan_delete_tombstone
    # pins the full lifecycle)
    sp = scd2_apply(base, orphan, key="k", attrs=["v"], on_late="splice")
    t = [r for r in sp.filter("k = 9").collect()]
    assert len(t) == 1 and t[0].valid_from == t[0].valid_to == T1


def test_scd2_apply_orphan_delete_on_fully_closed_key_raises(spark):
    """Round-12 ADVICE (medium): the orphan-delete guard's presence
    probe must ride the OPEN-version set, not all base rows. A 'D' for
    a key whose versions are all closed has nothing to close — the
    close-current join misses, the opened branch filters 'D', and the
    event previously vanished silently, the same out-of-order class
    the guard was added for (its insert hasn't arrived, or it is a
    duplicate delete). Error mode now raises; splice persists the
    tombstone and converges when the insert lands."""
    import pytest

    # key 5 existed once and is fully closed [T0, T1); no open version
    closed = spark.createDataFrame(
        [(5, 50.0, T0, T1, False)],
        "k int, v double, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    dup_d = spark.createDataFrame(
        [(5, 0.0, "D", T2)], "k int, v double, op string, ts timestamp"
    )
    with pytest.raises(Exception, match="no open version"):
        scd2_apply(closed, dup_d, key="k", attrs=["v"]).collect()
    # the filter-borne guard fires on every action shape
    with pytest.raises(Exception, match="no open version"):
        scd2_apply(closed, dup_d, key="k", attrs=["v"]).count()

    # splice mode: the D persists as a zero-length tombstone beside the
    # closed history, and the late insert rebuilds [T1b, T2) chronology
    sp = scd2_apply(
        closed, dup_d, key="k", attrs=["v"], on_late="splice"
    ).localCheckpoint(eager=True)
    got = {
        (r.v, r.valid_from, r.valid_to, r.is_current) for r in sp.collect()
    }
    assert got == {(50.0, T0, T1, False), (None, T2, T2, False)}, got

    # an I-then-D batch on the fully-closed key in ERROR mode stays
    # legal (ordered events after the closure): a new closed version
    ordered = spark.createDataFrame(
        [(5, 55.0, "I", T1), (5, 0.0, "D", T2)],
        "k int, v double, op string, ts timestamp",
    )
    k5 = {
        (r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(closed, ordered, key="k", attrs=["v"]).collect()
    }
    assert k5 == {(50.0, T0, T1, False), (55.0, T1, T2, False)}


def test_scd2_apply_ntz_batch_cast_to_snapshot_dtype(spark):
    """Round-11 ADVICE: a TIMESTAMP_NTZ change batch against an LTZ
    snapshot is cast to the snapshot's validity dtype AT ENTRY (one
    explicit cast) instead of leaning on union-time coercion — result
    schema and values must match the plain-LTZ batch in every mode."""
    base = _base(spark)
    ltz = _changes(spark)
    ntz = ltz.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    for mode in ("error", "splice", "ignore"):
        want = {
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_apply(
                base, ltz, key="k", attrs=["v"], on_late=mode
            ).collect()
        }
        out = scd2_apply(base, ntz, key="k", attrs=["v"], on_late=mode)
        assert dict(out.dtypes)["valid_from"] == "timestamp", mode
        assert dict(out.dtypes)["valid_to"] == "timestamp", mode
        got = {
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()
        }
        assert got == want, mode


def test_scd2_date_snapshot_schema_preserved_and_mismatch_raises(spark):
    """Round-11 review-2 finding #1, pinned: a DATE-typed snapshot must
    come back DATE-typed from EVERY mode (the error-mode raise_error
    guards cast to the table's validity dtype, not a literal
    timestamp), and a change batch whose ts dtype differs from the
    snapshot's validity dtype is refused at entry rather than silently
    widened/truncated."""
    import pytest

    base = spark.createDataFrame(
        [(1, 10.0, dt.date(2020, 1, 1), None, True)],
        "k int, v double, valid_from date, valid_to date, is_current boolean",
    )
    ch = spark.createDataFrame(
        [(1, 11.0, "U", dt.date(2021, 1, 1))],
        "k int, v double, op string, ts date",
    )
    for mode in ("error", "splice", "ignore"):
        out = scd2_apply(base, ch, key="k", attrs=["v"], on_late=mode)
        assert dict(out.dtypes)["valid_to"] == "date", (mode, out.dtypes)
        got = {
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()
        }
        assert got == {
            (1, 10.0, dt.date(2020, 1, 1), dt.date(2021, 1, 1), False),
            (1, 11.0, dt.date(2021, 1, 1), None, True),
        }, (mode, got)

    ts_batch = spark.createDataFrame(
        [(1, 11.0, "U", dt.datetime(2021, 1, 1, 13, 0))],
        "k int, v double, op string, ts timestamp",
    )
    for mode in ("error", "splice", "ignore"):
        with pytest.raises(ValueError, match="dtype"):
            scd2_apply(base, ts_batch, key="k", attrs=["v"], on_late=mode)


def test_scd2_partitioned_census_rides_write_and_pre_tombs_known_skips_scan(
    spark, tmp_path
):
    """Optimization-round-15 witnesses for the two per-batch job cuts
    in scd2_apply_partitioned:

    (a) the post-merge tombstone census rides the WRITE job as
        Observation metrics and still reports exactly the at-rest
        per-bucket counts (pinned against a direct snapshot read);
    (b) buckets covered by ``pre_tombs_known`` skip the pre-merge
        tombstone scan — exactly ONE fewer Spark job than the scan
        path on an identical snapshot + batch — with a bit-identical
        report and at-rest result."""
    import shutil

    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import (
        persist_scd2_partitioned,
        scd2_apply_partitioned,
    )

    base = spark.createDataFrame(
        [
            (k, float(k), dt.datetime(2020, 1, 1), None, True)
            for k in range(1, 21)
        ],
        "k bigint, v double, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    seed_dir = str(tmp_path / "seed")
    persist_scd2_partitioned(base, seed_dir, "k", n_parts=4)

    # batch 1: two orphan deletes (D-before-I) -> splice mints
    # zero-length tombstones; census must equal the at-rest truth
    b1 = spark.createDataFrame(
        [(100, 0.0, "D", T1), (101, 0.0, "D", T1), (1, 1.5, "U", T1)],
        "k bigint, v double, op string, ts timestamp",
    )
    rep1 = scd2_apply_partitioned(
        spark, seed_dir, b1, key="k", attrs=["v"], n_parts=4, on_late="splice"
    )
    is_tomb = F.col("valid_to").isNotNull() & (
        F.col("valid_to") == F.col("valid_from")
    )
    at_rest = {
        int(r["pb"]): int(r["n"])
        for r in spark.read.parquet(seed_dir)
        .filter(is_tomb)
        .groupBy("pb")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(rep1["orphan_tombstones_by_bucket"].values()) == 2
    for b, n in rep1["orphan_tombstones_by_bucket"].items():
        assert at_rest.get(b, 0) == n, (b, n, at_rest)
    assert rep1["rows_written"] == spark.read.parquet(seed_dir).filter(
        F.col("pb").isin(rep1["changed_buckets"])
    ).count()

    # batch 2 on two identical copies: known-pre vs scan path
    copy_a = str(tmp_path / "copy_a")
    copy_b = str(tmp_path / "copy_b")
    shutil.copytree(seed_dir, copy_a)
    shutil.copytree(seed_dir, copy_b)
    # the k=100 insert PREDATES its orphan delete (T1) — splice then
    # rebuilds the pair into a closed [insert_ts, T1) version and the
    # tombstone drains (post < pre in that bucket)
    b2 = spark.createDataFrame(
        [(100, 9.0, "I", dt.datetime(2020, 6, 1)), (1, 2.5, "U", T2)],
        "k bigint, v double, op string, ts timestamp",
    )
    sc = spark.sparkContext

    sc.setJobGroup("cdc_known", "pre_tombs_known path")
    try:
        rep_known = scd2_apply_partitioned(
            spark,
            copy_a,
            b2,
            key="k",
            attrs=["v"],
            n_parts=4,
            on_late="splice",
            pre_tombs_known=rep1["orphan_tombstones_by_bucket"],
        )
        jobs_known = len(
            sc.statusTracker().getJobIdsForGroup("cdc_known")
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)

    sc.setJobGroup("cdc_scan", "scan path")
    try:
        rep_scan = scd2_apply_partitioned(
            spark, copy_b, b2, key="k", attrs=["v"], n_parts=4,
            on_late="splice",
        )
        jobs_scan = len(sc.statusTracker().getJobIdsForGroup("cdc_scan"))
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)

    # b2's buckets are a subset of b1's touched set (same keys), so the
    # known path must not have scanned at all: strictly fewer jobs (the
    # dropped pre-census is 1-2 jobs — AQE runs its groupBy's shuffle
    # stage and result stage as separate jobs)
    assert set(rep_known["changed_buckets"]) <= set(
        rep1["orphan_tombstones_by_bucket"]
    )
    assert jobs_scan - jobs_known >= 1, (jobs_known, jobs_scan)
    assert rep_known == rep_scan
    got_a = {
        tuple(r)
        for r in spark.read.parquet(copy_a)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    }
    got_b = {
        tuple(r)
        for r in spark.read.parquet(copy_b)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    }
    assert got_a == got_b
    # the insert for k=100 drained that bucket's tombstone: growth
    # bookkeeping must see post < pre there
    tomb_bucket_100 = [
        b
        for b, n in rep_known["orphan_tombstones_pre_by_bucket"].items()
        if n and b in rep_known["changed_buckets"]
    ]
    assert any(
        rep_known["orphan_tombstones_by_bucket"][b]
        < rep_known["orphan_tombstones_pre_by_bucket"][b]
        for b in tomb_bucket_100
    )
