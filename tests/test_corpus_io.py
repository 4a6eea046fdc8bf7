"""JSONL corpus interchange: write → read round-trip against the
parquet fixtures, dead-letter capture for malformed lines, and the
streaming reader lane."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table
from pulsar_elasticsearch_sync_rs_spark.sources.corpus_io import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="corpus_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmpdir):
    docs = read_table(spark, sf_dir, "documents")
    path = os.path.join(tmpdir, "docs_jsonl")
    write_jsonl(docs, path, n_shards=4)
    schema = docs.schema
    # sharded gzip text files on disk
    shards = [f for f in os.listdir(path) if f.endswith(".txt.gz")]
    assert len(shards) == 4
    back, dead = split_corrupt(read_jsonl(spark, path, schema=schema))
    assert dead.count() == 0
    assert back.count() == docs.count()
    # value-exact round trip (order-insensitive anti-join both ways)
    cols = docs.columns
    assert back.select(cols).exceptAll(docs.select(cols)).isEmpty()
    assert docs.select(cols).exceptAll(back.select(cols)).isEmpty()


def test_jsonl_dead_letters_malformed_lines(spark, tmpdir):
    path = os.path.join(tmpdir, "mixed")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}\n')
        f.write("{broken json\n")
        f.write('{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s"}\n')
    clean, dead = split_corrupt(read_jsonl(spark, path))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert dead.count() == 1
    assert "{broken json" in dead.collect()[0]["_corrupt_record"]


def test_jsonl_all_null_row_roundtrips_clean(spark, tmpdir):
    # A legit row whose schema fields are all NULL must NOT be
    # dead-lettered: the writer keeps explicit nulls
    # (ignoreNullFields=false) and the reader flags corruption via
    # columnNameOfCorruptRecord, not an all-null heuristic.
    from pulsar_elasticsearch_sync_rs_spark.sources.corpus_io import DOCUMENTS_SCHEMA

    df = spark.createDataFrame(
        [(None, None, None, None), (7, "t", "en", "s")], schema=DOCUMENTS_SCHEMA
    )
    path = os.path.join(tmpdir, "nulls")
    write_jsonl(df, path, n_shards=1, compress=False)
    shard = [f for f in os.listdir(path) if f.startswith("part-")][0]
    with open(os.path.join(path, shard)) as f:
        lines = f.read().splitlines()
    assert any('"doc_id":null' in ln for ln in lines)  # explicit nulls on disk
    clean, dead = split_corrupt(read_jsonl(spark, path))
    assert dead.count() == 0
    assert clean.count() == 2
    assert clean.filter(F.col("doc_id").isNull()).count() == 1


def test_jsonl_streaming_reader(spark, sf_dir, tmpdir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    src = os.path.join(tmpdir, "src")
    write_jsonl(docs, src, n_shards=2, compress=False)
    out_dir = os.path.join(tmpdir, "out")
    stream, _ = split_corrupt(read_jsonl(spark, src, schema=docs.schema, streaming=True))
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 50
