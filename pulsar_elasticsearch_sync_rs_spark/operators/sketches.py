"""Count-min sketch — the mergeable frequency sketch for heavy-hitter
queries over corpora whose vocabulary is too large to tabulate
exactly (SURVEY.md §2.9 extended surface; same "sketch lane beside
the exact lane" contract as q_approx_quantiles vs q_quantiles).

At 100 TB the exact token-frequency table (q_vocab_topk's groupBy)
shuffles one (token, count) partial per distinct token per partition.
A count-min sketch caps the aggregation state at a FIXED d×w cell
grid regardless of vocabulary size: each occurrence increments d
cells (one per hash row), a point estimate reads the MIN of a
token's d cells — always an overestimate, within ε·N with high
probability for w = ⌈e/ε⌉ (Cormode & Muthukrishnan 2005).

Spark-first shape: the "increment d cells" step is an explode onto d
(row, col) keys followed by a plain groupBy count — map-side partial
combine collapses each partition's contribution to ≤ d·w cells before
the shuffle, so the wire cost is O(partitions · d · w), independent
of corpus size. The resulting cell table IS the sketch: tiny
(d·w rows), broadcastable, and MERGEABLE — sketches of two corpus
shards with the same (d, w, seeds) merge by cell-wise addition
(pytest-pinned), which is what lets a 1000-executor fleet sketch
shards independently and union the results.

Hashing: Spark's 64-bit xxhash64 seeded per row via a (token, row)
compound hash — deterministic, engine-native, no RNG.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_min_sketch(
    df: DataFrame, token_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Build a d×w count-min sketch over the rows of ``df`` (one
    occurrence per row). Returns the cell table
    ``(row int, col int, cnt bigint)`` — absent cells are zero."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(F.xxhash64(F.col(token_col), F.lit(i)), F.lit(w))
                        .cast("int")
                        .alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col")).agg(
        F.count("*").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (d, w): cell-wise addition."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame, candidates: DataFrame, token_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-estimate the frequency of each candidate token: min over
    its d cells (missing cell ⇒ 0 ⇒ token never seen). ``candidates``
    is expected to be small (a watchlist); the sketch side is ≤ d·w
    rows, so Catalyst broadcasts whichever side is tinier — no large
    shuffle either way. Adds ``est_n`` to the candidate columns."""
    probes = candidates.select(
        *candidates.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(F.xxhash64(F.col(token_col), F.lit(i)), F.lit(w))
                        .cast("int")
                        .alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
    ).select(*candidates.columns, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    joined = probes.join(cms, ["row", "col"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(*candidates.columns).agg(F.min("cnt").alias("est_n"))
