"""Broadcast Bloom-filter join pruning — ship an m-bit membership
summary of the dim keys to every fact scan instead of shuffling the
full fact table into the join.

At 100 TB, a fact⋈dim join whose dim side is too big to broadcast
shuffles EVERY fact row, even though most match nothing. Engines fix
this with runtime semi-join filters; Spark's own bloom rewrite
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) only triggers on
selective dim FILTERS, and its `bloom_filter_agg` primitive is not
exposed to SQL/DataFrame callers. This operator is the explicit,
caller-controlled form:

1. hash each dim key onto k bit positions (seeded xxhash64 — same
   engine-native hashing as the count-min sketch) and collect the
   DISTINCT positions (bounded by m bits, independent of dim row
   count — the same fixed-size-summary trick as the CMS cell grid);
2. pack them into an m-bit numpy bitset on the driver and close over
   it in an Arrow-batched pandas UDF (one broadcast of m/8 bytes);
3. pre-filter the fact side before the shuffle: a key passes iff all
   k bits are set. No false negatives, so the following exact join
   removes the (bounded-rate) false positives and the result is
   IDENTICAL to the plain join — which is exactly what the DuckDB
   oracle checks.

The win at scale: the fact shuffle carries only rows that (probably)
match, at the cost of one tiny dim aggregation and an m/8-byte task
closure. FP rate ≈ (1 - e^{-kn/m})^k; the default m=2^20, k=5 holds
<1% up to ~10⁵ dim keys — size m to the dim cardinality.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bit_positions(key_col: str, k: int, m: int):
    # hash the key's STRING rendering: xxhash64 is type-sensitive
    # (xxhash64(7::int) != xxhash64(7::bigint)) while the exact join
    # this operator must agree with coerces numeric types — hashing the
    # canonical rendering keeps build and probe in agreement across
    # int/bigint key columns. (Keys whose renderings differ, e.g.
    # 7 vs 7.0 double, would not survive the exact join's coercion
    # contract either — match your key types as you would for any
    # hash-bucketed structure.)
    key = F.col(key_col).cast("string")
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)).cast("long") for i in range(k)]
    )


def build_bloom(dim: DataFrame, key: str, k: int = 5, m: int = 1 << 20) -> np.ndarray:
    """Aggregate the dim keys into an m-bit Bloom bitset (numpy
    uint8[m/8]). The shuffle moves ≤ m distinct bit positions no
    matter how many dim rows there are; the collect is ≤ m longs."""
    positions = (
        dim.select(F.explode(_bit_positions(key, k, m)).alias("pos")).distinct().collect()
    )
    bits = np.zeros(m // 8, dtype=np.uint8)
    pos = np.fromiter((r["pos"] for r in positions), dtype=np.int64, count=len(positions))
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_prune(fact: DataFrame, key: str, bits: np.ndarray, k: int = 5) -> DataFrame:
    """Keep only fact rows whose key MAY be in the set the bitset
    summarizes (all k bits set). Never drops a true match; follow with
    the exact join to remove false positives. The probe is an
    Arrow-batched pandas UDF doing vectorized numpy bit tests — no
    row-at-a-time Python."""
    if "__bloom_pos" in fact.columns:
        raise ValueError("fact already has a __bloom_pos column; rename it before pruning")
    m = int(bits.shape[0]) * 8

    # the k positions are computed with the SAME engine-native
    # expression used at build time (hash agreement is structural, not
    # a reimplementation); only the bit test crosses into Arrow/numpy
    positions = _bit_positions(key, k, m)

    @F.pandas_udf(T.BooleanType())
    def test_bits(pos_arrays: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in pos_arrays:
            if len(s) == 0:
                yield pd.Series([], dtype=bool)
                continue
            mat = np.vstack(s.to_numpy())  # (batch, k) int64 positions
            byte_idx = mat >> 3
            bit_mask = np.uint8(1) << (mat & 7).astype(np.uint8)
            hit = (bits[byte_idx] & bit_mask) != 0
            yield pd.Series(hit.all(axis=1))

    return (
        fact.withColumn("__bloom_pos", positions)
        .filter(test_bits(F.col("__bloom_pos")))
        .drop("__bloom_pos")
    )


def bloom_join(
    fact: DataFrame, dim: DataFrame, key: str, k: int = 5, m: int = 1 << 20
) -> DataFrame:
    """Inner equi-join with Bloom pre-pruning of the fact side: result
    identical to ``fact.join(dim, key)`` (no false negatives; the join
    removes false positives), but the fact shuffle only carries
    probably-matching rows."""
    bits = build_bloom(dim, key, k=k, m=m)
    return bloom_prune(fact, key, bits, k=k).join(dim, key)
