"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.9): exact, normalized, MinHash+LSH, SimHash, n-gram
Jaccard. Designed for 100 TB:

- exact/normalized dedup: hash-groupBy — ONE shuffle on a 256-bit hash
  (uniformly distributed, no skew), map-side combine; never shuffles
  the document text itself when only ids are needed.
- MinHash+LSH: shingle -> K minhashes (pure int arithmetic on crc32/xxhash,
  no UDF) -> band signatures -> explode bands -> self-join on
  (band_id, band_hash). The candidate join is on short uniform hash
  keys; true Jaccard verification runs only on candidates. This is the
  standard near-linear near-dup pipeline (vs the quadratic all-pairs
  join).
- SimHash: 64-bit signed projection of token hashes; near-dups = equal
  simhash buckets (or small Hamming distance via band rotation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsar_elasticsearch_sync_rs_spark.functions.text import word_shingles, ws_tokens

MERSENNE = 2147483647  # 2^31 - 1, modulus for minhash permutations


def dedup_exact(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest-id row per identical text.

    Implemented as sha2-256 hash groupBy (the text column itself never
    shuffles — only the 32-byte hash + id), then a semi-join back.
    At 100 TB this is the cheapest correct strategy: uniform keys, full
    map-side partial aggregation.
    """
    h = F.sha2(F.col(text), 256)
    keep = (
        df.select(F.col(id_col), h.alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .drop("__h")
    )
    return df.join(keep, id_col, "left_semi")


def normalize_text(text: Column | str) -> Column:
    """Normalization used for near-exact dedup: lowercase, strip
    punctuation, collapse whitespace."""
    text = F.col(text) if isinstance(text, str) else text
    t = F.lower(text)
    t = F.regexp_replace(t, r"[\p{Punct}]", " ")
    t = F.regexp_replace(F.trim(t), r"\s+", " ")
    return t


def dedup_normalized(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup on normalized text (same scale posture as
    :func:`dedup_exact`)."""
    norm = normalize_text(text)
    w = Window.partitionBy(F.sha2(norm, 256)).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signature(hashes: Column, num_hashes: int = 32) -> Column:
    """K minhash values via the standard (a*h + b) mod p permutation
    family over precomputed shingle hashes — pure integer expressions,
    no UDF. Odd multipliers a_i, deterministic b_i (public MinHash
    construction, Broder 1997).

    Built as ONE ``zip_with`` over literal coefficient arrays (not K
    separate columns): Catalyst's projection collapse would otherwise
    inline the shingle subtree K times and re-tokenize the document per
    hash — the difference between seconds and hours on real text.
    ``hashes`` should be a *materialized* column (see
    :func:`minhash_candidates`'s repartition barrier).
    """
    a_arr = F.array(*[F.lit(2 * i + 1).cast("bigint") for i in range(num_hashes)])
    b_arr = F.array(
        *[F.lit(40503 * (i + 1) % MERSENNE).cast("bigint") for i in range(num_hashes)]
    )
    return F.zip_with(
        a_arr,
        b_arr,
        # empty-shingle sentinel: array_min of an empty array is null;
        # coalesce to MERSENNE so this lane matches the UDF lane's
        # [MERSENNE]*K signature for empty/too-short docs
        lambda a, b: F.coalesce(
            F.array_min(F.transform(hashes, lambda h: (h * a + b) % MERSENNE)),
            F.lit(MERSENNE).cast("bigint"),
        ),
    )


def make_minhash_udf(num_hashes: int = 32, shingle_k: int = 3):
    """The production minhash kernel: text → whitespace tokens →
    k-word shingle set → crc32 → K permutation minima, all inside one
    Arrow-batched numpy UDF.

    Why a UDF and not expressions: Spark's higher-order functions are
    CodegenFallback (interpreted per element). The expression form of
    this kernel measured 364 s over 5,000 docs at sf0.1; this UDF does
    the same work in seconds and parallelizes per Arrow batch across
    executors. crc32-of-UTF-8 matches Spark's builtin ``crc32`` and the
    permutation family matches :func:`minhash_signature`, so the two
    lanes are interchangeable.
    """
    a_coef = (2 * np.arange(num_hashes, dtype=np.int64) + 1)
    b_coef = (40503 * (np.arange(num_hashes, dtype=np.int64) + 1)) % MERSENNE

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in text:
            toks = t.split() if t else []
            n = len(toks) - shingle_k + 1
            if n <= 0:
                # empty-shingle sentinel: all empty docs share a signature
                out.append([MERSENNE] * num_hashes)
                continue
            shingles = {" ".join(toks[i : i + shingle_k]) for i in range(n)}
            hv = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            out.append(((hv[:, None] * a_coef + b_coef) % MERSENNE).min(axis=0).tolist())
        return pd.Series(out)

    return minhash_udf


def minhash_candidates(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band of their minhash
    signature. Returns (id_a, id_b) with id_a < id_b, distinct.

    Scale path: signature via one vectorized UDF pass (narrow), explode
    to (band_id, band_hash, id) — short uniform keys — then self-join
    per bucket. Only ids + band hashes shuffle; the text never does.
    """
    rows_per_band = num_hashes // bands
    mh = make_minhash_udf(num_hashes, shingle_k)
    sig = df.select(F.col(id_col), mh(F.col(text)).alias("sig"))
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.sha2(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                ),
                256,
            ).alias("band_hash"),
        ),
    )
    banded = sig.select(id_col, F.explode(band_arr).alias("band")).select(
        id_col, "band.band_id", "band.band_hash"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs ≥ threshold.

    LOSSLESS size filtering (the AllPairs/PPJoin size filter — Bayardo
    et al. WWW'07, Xiao et al. — public literature): ``J(A,B) ≥ t``
    implies ``t ≤ |A|/|B| ≤ 1/t``, so docs are banded by
    ``floor(log_{1/t} |shingles|)`` and a qualifying pair can only sit
    in the same or an adjacent band. Joining on the band key turns the
    all-pairs nested loop into an equi-(hash)-join whose per-key block
    is bounded by the size distribution — candidate enumeration is no
    longer quadratic in the block, and the pruning is implied by the
    threshold, so results (and the SQL oracle) are unchanged. The
    probabilistic 100 TB path is still :func:`minhash_candidates` +
    verify (see ``dedup_minhash_verified``).
    """
    import math

    sh = df.select(
        F.col(id_col), word_shingles(text, shingle_k).alias("sh"),
        *([F.col(block_col)] if block_col else []),
    )
    # Exchange barrier: materializes the shingle arrays so the
    # interpreted-HOF shingle expression isn't re-inlined downstream,
    # and spreads a single-file input across cores.
    sh = sh.repartition(sh.sparkSession.sparkContext.defaultParallelism, id_col)
    sh = sh.withColumn("n_sh", F.size("sh"))
    if 0.0 < threshold < 1.0:
        band = F.floor(
            F.log(F.greatest(F.col("n_sh"), F.lit(1)).cast("double"))
            / math.log(1.0 / threshold)
        ).cast("int")
    else:
        # t=1 → equal sets → equal sizes; t=0 → no pruning possible
        band = (F.col("n_sh") if threshold >= 1.0 else F.lit(0)).cast("int")
    sh = sh.withColumn("band", band)
    # explode one side to {band-1, band, band+1}: a qualifying pair's
    # bands differ by ≤1, so exactly one key matches — no distinct needed
    a = sh.withColumn(
        "band_key", F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1))
    ).alias("a")
    b = sh.alias("b")
    cond = (
        (F.col("a.band_key") == F.col("b.band"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        # exact size-ratio filter: cheap scalar pre-check before the
        # array intersection
        & (F.col("a.n_sh").cast("double") >= threshold * F.col("b.n_sh"))
        & (F.col("b.n_sh").cast("double") >= threshold * F.col("a.n_sh"))
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_minhash_verified(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup pairs at scale: LSH candidates pruned, then verified
    with exact Jaccard on the candidate set only. Output subset of the
    all-pairs result (LSH recall < 1 by construction; bands/hashes set
    the recall curve)."""
    cand = minhash_candidates(df, text, id_col, num_hashes, bands, shingle_k)
    sh = df.select(F.col(id_col), word_shingles(text, shingle_k).alias("sh"))
    j = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return (
        j.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens (Charikar 2002): per bit,
    sum +1/-1 according to whether the token's 64-bit hash has that bit
    set; the result bit is set iff the sum is positive.

    Arrow-vectorized numpy kernel (same rationale as the minhash UDF:
    nested higher-order expressions are both unsupported by the lambda
    builder and interpreted at runtime). Token hash = first 8 bytes of
    blake2b — deterministic, public, stdlib.
    """
    text = F.col(text) if isinstance(text, str) else text

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        import hashlib

        bit_idx = np.arange(64, dtype=np.uint64)
        out = []
        for t in texts:
            toks = t.split() if t else []
            if not toks:
                out.append(0)
                continue
            hv = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
                    )
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            signs = (((hv[:, None] >> bit_idx) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
            bits = np.uint64(0)
            for i in np.nonzero(signs > 0)[0]:
                bits |= np.uint64(1) << np.uint64(i)
            out.append(int(bits.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return simhash_udf(text)


def dedup_simhash(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash-bucket dedup: keep the lowest id per identical 64-bit
    simhash (hamming-0 buckets; near-dup via banded rotations is a
    natural extension). One shuffle on the 64-bit signature."""
    w = Window.partitionBy("__sh").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__sh", simhash64(F.col(text)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__sh")
    )
