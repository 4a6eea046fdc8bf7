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
    # both base-touching joins (close-current inner, untouched anti)
    # must be broadcast hash joins — the base is never exchanged
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
