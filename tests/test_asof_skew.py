"""As-of join and salted aggregation unit tests (planted cases)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.operators.asof import asof_join
from pulsar_elasticsearch_sync_rs_spark.operators.skew import salted_count, salted_sum


def test_asof_join_planted(spark):
    left = spark.createDataFrame(
        [
            Row(ev=1, k="a", ts=10),
            Row(ev=2, k="a", ts=25),
            Row(ev=3, k="a", ts=5),  # before any right row -> NULL
            Row(ev=4, k="b", ts=100),  # key with no right rows -> NULL
        ]
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [
            Row(k="a", rts=10, rid=1, val=1.0),  # ties at rts=10: rid 2 wins
            Row(k="a", rts=10, rid=2, val=2.0),
            Row(k="a", rts=20, rid=3, val=3.0),
        ]
    ).withColumn("rts", F.timestamp_seconds("rts"))

    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid", "val"], right_tiebreaker="rid",
    )
    got = {r["ev"]: (r["asof_rid"], r["asof_val"]) for r in out.collect()}
    assert got[1] == (2, 2.0)  # inclusive <= and latest-tiebreaker wins
    assert got[2] == (3, 3.0)
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_salted_agg_equals_direct(spark, sf_dir):
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    direct = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["event_type"], r["n_records"])
        for r in salted_count(ev, "event_type", "event_id", n_salts=8).collect()
    }
    assert direct == salted

    s = salted_sum(ev, "event_type", F.col("value").cast("decimal(18,2)"), "event_id")
    direct_sum = {
        (r["event_type"], r["t"])
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("t"))
        .collect()
    }
    assert {(r["event_type"], r["total"]) for r in s.collect()} == direct_sum


def test_range_join_boundary_semantics(spark):
    """Planted edge cases for the bucketed range join: start inclusive,
    end exclusive, interval crossing a bucket boundary, point exactly on
    a bucket boundary, empty interval, and pair-uniqueness (no dedup
    pass exists, so double-emission would show up as duplicate rows)."""
    from datetime import datetime

    from pulsar_elasticsearch_sync_rs_spark.operators.range_join import bucketed_range_join

    T = datetime
    intervals = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 10), T(2024, 1, 1, 0, 40)),  # crosses 00:30 bucket edge
            (2, T(2024, 1, 1, 1, 0), T(2024, 1, 1, 1, 30)),   # aligned exactly to buckets
            (3, T(2024, 1, 1, 2, 0), T(2024, 1, 1, 2, 0)),    # empty: matches nothing
        ],
        "iid int, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, T(2024, 1, 1, 0, 10)),   # == start of 1 -> inclusive
            (11, T(2024, 1, 1, 0, 30)),   # on bucket boundary, inside 1
            (12, T(2024, 1, 1, 0, 40)),   # == end of 1 -> exclusive
            (13, T(2024, 1, 1, 1, 29, 59)),  # just inside 2
            (14, T(2024, 1, 1, 1, 30)),   # == end of 2 -> exclusive
            (15, T(2024, 1, 1, 2, 0)),    # empty interval 3: no match
        ],
        "pid int, ts timestamp",
    )
    out = bucketed_range_join(points, intervals, "ts", "s", "e", bucket_width_s=1800)
    pairs = sorted((r.iid, r.pid) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (2, 13)]
    assert len(pairs) == len(set(pairs))  # emitted exactly once each


def test_range_join_guard_rejects_mega_interval(spark):
    """An interval fanning out past max_buckets_per_interval must fail
    fast (assert_true), not silently explode."""
    from datetime import datetime

    import pytest as _pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.range_join import bucketed_range_join

    intervals = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), datetime(2024, 3, 1))], "iid int, s timestamp, e timestamp"
    )
    points = spark.createDataFrame([(1, datetime(2024, 1, 5))], "pid int, ts timestamp")
    out = bucketed_range_join(
        points, intervals, "ts", "s", "e", bucket_width_s=60, max_buckets_per_interval=1000
    )
    with _pytest.raises(Exception, match="range_join"):
        out.collect()


def test_salted_join_equals_direct(spark, sf_dir):
    """The salted join must return exactly the plain join's rows, with
    a planted hot key dominating the fact side."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import salted_join
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    # plant skew: 80% of fact rows collapse onto one hot user
    fact = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 != 0, F.lit(7)).otherwise(F.col("user_id")),
    )
    dim = (
        read_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    direct = {
        (r["event_id"], r["c_name"])
        for r in fact.join(dim, "user_id").select("event_id", "c_name").collect()
    }
    salted = {
        (r["event_id"], r["c_name"])
        for r in salted_join(fact, dim, "user_id", salt_from="event_id")
        .select("event_id", "c_name")
        .collect()
    }
    assert salted == direct
    n = salted_join(fact, dim, "user_id", salt_from="event_id").count()
    assert n == len(direct), "salting fabricated duplicate matches"


def test_bloom_prune_no_false_negatives(spark, sf_dir):
    """Bloom pruning must keep EVERY matching fact row (no false
    negatives) and drop most non-matching rows on a sparse dim."""
    from pulsar_elasticsearch_sync_rs_spark.operators.bloom import (
        bloom_prune,
        build_bloom,
    )
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = ev.select("user_id").distinct().filter(F.col("user_id") % 17 == 0)
    dim_keys = {r["user_id"] for r in dim.collect()}
    assert dim_keys, "fixture has no sparse dim keys"

    bits = build_bloom(dim, "user_id", k=5, m=1 << 16)
    kept = bloom_prune(ev, "user_id", bits, k=5)
    kept_keys = {r["user_id"] for r in kept.collect()}
    assert dim_keys <= kept_keys, "bloom dropped a true match"

    n_total = ev.count()
    n_kept = kept.count()
    n_match = ev.join(dim, "user_id", "left_semi").count()
    # every match kept, plus a bounded trickle of false positives
    assert n_kept >= n_match
    assert n_kept <= n_match + max(10, 0.02 * n_total), (
        f"false-positive rate too high: kept {n_kept} of {n_total}, true {n_match}"
    )


def test_bloom_survives_key_type_mismatch(spark):
    """xxhash64 is type-sensitive; the bloom must still keep every true
    match when fact and dim key columns are int vs bigint (the exact
    join coerces them), because hashing goes through the canonical
    string rendering."""
    from pulsar_elasticsearch_sync_rs_spark.operators.bloom import bloom_join

    fact = spark.createDataFrame([(i, i % 10) for i in range(100)], "event_id int, k int")
    dim = spark.createDataFrame([(3, "x"), (7, "y")], "k long, tag string")
    got = {(r["event_id"], r["tag"]) for r in bloom_join(fact, dim, "k").collect()}
    want = {(r["event_id"], r["tag"]) for r in fact.join(dim, "k").collect()}
    assert got == want and len(want) == 20


def test_salted_join_null_salt_source(spark):
    """A NULL salt_from value must not drop the row: it coalesces to
    salt 0 and still matches its dim replica."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(None, 7), (1, 7), (2, 99)], "event_id long, k long")
    dim = spark.createDataFrame([(7, "x")], "k long, tag string")
    pairs = [
        (r["event_id"], r["tag"])
        for r in salted_join(fact, dim, "k", salt_from="event_id").collect()
    ]
    got = sorted(pairs, key=lambda t: (t[0] is not None, t[0] or 0))
    assert got == [(None, "x"), (1, "x")]
