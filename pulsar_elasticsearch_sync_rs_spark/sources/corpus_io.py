"""Corpus interchange I/O — JSONL (the de-facto LLM training-data
format) in and out, batch and streaming.

Read side: ``spark.read.json`` with an EXPLICIT schema — never infer
on a big corpus (inference is a full extra pass over the data) — plus
``columnNameOfCorruptRecord`` dead-lettering so one malformed line
cannot abort a 100 TB ingest (ANSI-mode discipline, same stance as
the ETL chain's F4 filter).

Write side: sharded ``.jsonl.gz`` via the text writer — one JSON
object per line, gzip per shard, ``repartition(n_shards)`` controls
shard count/size. Round-trips are pinned by pytest against the
parquet fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    streaming: bool = False,
) -> DataFrame:
    """JSONL reader (batch or file-stream) with dead-letter capture:
    rows whose line failed to parse carry the raw line in
    ``_corrupt_record`` (NULL schema fields). Split with
    :func:`split_corrupt`.

    Implemented as text source + ``from_json`` — the same parse
    discipline as the ETL chain's F4 — rather than the JSON reader's
    internal corrupt-record column, whose
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction forbids the natural
    dead-letter count without caching the whole parse. The text source
    decompresses ``.gz`` shards transparently and needs no schema
    inference pass.

    Corruption is flagged PRECISELY by appending ``_corrupt_record``
    to the ``from_json`` schema with ``columnNameOfCorruptRecord``
    (PERMISSIVE mode fills it only for malformed lines), so a
    legitimate row whose schema fields are all NULL round-trips clean
    instead of being inferred corrupt. The only struct-NULL case left
    is a blank line, handled by the ``__j IS NULL`` fallback."""
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path)
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = raw.select(
        F.from_json(
            "value", parse_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("__j"),
        F.col("value").alias("__raw"),
    )
    corrupt = F.when(F.col("__j").isNull(), F.col("__raw")).otherwise(
        F.col(f"__j.{CORRUPT_COL}")
    )
    return parsed.select(
        *[F.col(f"__j.{f.name}") for f in schema.fields],
        corrupt.alias(CORRUPT_COL),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, dead_letter_rows). Mirrors the
    ETL chain's F4 dead-letter split for the corpus lane; the dead side
    carries the raw line in ``_corrupt_record``."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, dead


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compress: bool = True,
) -> None:
    """Emit one JSON object per line (``to_json(struct(*))`` runs in
    whole-stage codegen — no Python in the write path), sharded by
    ``n_shards`` (None = keep the input partitioning; at scale pick
    shards so each lands in the 100 MB–1 GB range).

    ``ignoreNullFields=false`` keeps NULL fields explicit in the
    output so an all-NULL row serializes as ``{"f": null, ...}`` (not
    ``{}``) and survives the read side's corrupt check."""
    out = df.select(
        F.to_json(F.struct(*df.columns), {"ignoreNullFields": "false"}).alias("value")
    )
    if n_shards:
        out = out.repartition(n_shards)
    writer = out.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(path)
