"""Distributed total ordering (operators/ordering.py): exact gap-free
global positions with NO single-partition window — the scale-correct
zipWithIndex for DataFrames — and the deterministic epoch shuffle
built on it."""

from __future__ import annotations

import hashlib
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.operators.ordering import (
    epoch_shuffle,
    global_index,
)
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table


def test_global_index_exact_gapfree_and_ordered(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 7}") for i in range(101)], "id long, v string"
    ).repartition(5)
    out = global_index(df, "id", num_partitions=4).collect()
    assert sorted(r.pos for r in out) == list(range(101))
    # positions follow the order column exactly
    by_pos = sorted(out, key=lambda r: r.pos)
    assert [r.id for r in by_pos] == sorted(r.id for r in out)
    # payload columns survive untouched
    assert all(r.v == f"v{r.id % 7}" for r in out)


def test_global_index_start_offset_ties_and_guards(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(30)], "k long")
    out = global_index(df, "k", start=100, num_partitions=3).collect()
    # ties: every row still gets a distinct position, count preserved
    assert sorted(r.pos for r in out) == list(range(100, 130))
    # tied keys occupy contiguous position blocks (range partitioner
    # keeps equal keys together; sort is by k)
    by_pos = sorted(out, key=lambda r: r.pos)
    assert [r.k for r in by_pos] == sorted(r.k for r in out)
    with pytest.raises(ValueError, match="no column"):
        global_index(df, "nope")
    with pytest.raises(ValueError, match="already exists"):
        global_index(df.withColumn("pos", F.lit(1)), "k")


def test_global_index_empty_input_total(spark):
    df = spark.createDataFrame([], "id long, v string")
    assert global_index(df, "id").collect() == []


def test_global_index_plan_no_window(spark):
    """The reason this operator exists: row_number().over(orderBy)
    plans a single partition holding the whole dataset. The operator's
    plan must contain NO window, and the result must keep the range
    exchange's partition count (the work stays distributed)."""
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = global_index(df, "id", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert out.rdd.getNumPartitions() == 8


def test_epoch_shuffle_matches_reference_and_is_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    got = {
        (r.pos, r.doc_id)
        for r in epoch_shuffle(docs, "doc_id", epoch=7).collect()
    }
    ids = [r.doc_id for r in docs.collect()]
    order = sorted(
        ids, key=lambda i: hashlib.md5(f"ep7|{i}".encode()).hexdigest()
    )
    want = {(p, i) for p, i in enumerate(order)}
    assert got == want
    # partitioning-independent: same permutation from a skewed layout
    got2 = {
        (r.pos, r.doc_id)
        for r in epoch_shuffle(
            docs.repartition(13), "doc_id", epoch=7
        ).collect()
    }
    assert got2 == got
    # a different epoch is a different permutation
    got8 = {
        (r.pos, r.doc_id)
        for r in epoch_shuffle(docs, "doc_id", epoch=8).collect()
    }
    assert {i for _, i in got8} == set(ids) and got8 != got
    # the shuffle key is internal — output schema is input + pos
    assert set(epoch_shuffle(docs, "doc_id", epoch=7).columns) == {
        "doc_id",
        "pos",
    }
