"""Multimodal column plumbing (SURVEY.md §2.9).

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct. The Spark-side machinery —
schema, batch shape, Arrow transfer, ``mapInPandas`` signatures,
partition sizing — is real and tested; the codec step itself is
STUBBED (the image/audio libraries are not in this container) behind
``decode_stub`` / a deterministic fake feature extractor, clearly
marked below.

Scale posture: media blobs dominate bytes, so operators (a) never
shuffle the binary column unless the transform requires it, (b) process
via ``mapInPandas`` with bounded Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``), (c) carry metadata
in narrow columns so filters prune files without touching blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload: str = "payload") -> DataFrame:
    """Narrow metadata derivation over a binary column: length + sha256.
    Pure built-ins — blobs stay put, no Python round trip."""
    return df.withColumn("byte_len", F.length(F.col(payload)).cast("long")).withColumn(
        "sha", F.sha2(F.col(payload), 256)
    )


def decode_stub(kind: str):  # pragma: no cover - exercised via fake below
    """STUB: real decoders (PIL / soundfile / av) are not available in
    this container. The engine's contract is the signature below."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        "present in this environment; use fake_feature_extract for the "
        "plumbing tests"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def fake_feature_extract(df: DataFrame, payload: str = "payload", media_id: str = "media_id", dim: int = 8) -> DataFrame:
    """Deterministic FAKE feature extractor standing in for image/audio
    decode+embed: maps each blob to a `dim`-float vector derived from
    its bytes. Real Arrow-batched ``mapInPandas`` plumbing (this is the
    shape a PIL/torchvision extractor would use); only the math inside
    is a stand-in."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[payload]:
                b = bytes(blob) if blob is not None else b""
                # deterministic fake: byte-sum folded per stripe
                stripes = [0.0] * dim
                for i, by in enumerate(b):
                    stripes[i % dim] += by
                total = sum(stripes) or 1.0
                feats.append([s / total for s in stripes])
            yield pd.DataFrame(
                {
                    "media_id": pdf[media_id],
                    "byte_len": pdf[payload].map(lambda x: len(bytes(x)) if x is not None else 0),
                    "feature": feats,
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan* (schema + row-count contract): one
    output row per sampled frame timestamp. The decode that would fill
    ``frame_payload`` is stubbed (see decode_stub); timestamps derive
    from metadata only, so the plan runs without codecs."""
    frames = df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ),
    )
    return frames.withColumn("frame_payload", F.lit(None).cast("binary"))
