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
shards with the same (d, w) merge by cell-wise addition
(pytest-pinned), which is what lets a 1000-executor fleet sketch
shards independently and union the results.

Sketches travel as :class:`CmsSketch` (cells + their (d, w)), so
merge and estimate VALIDATE parameter agreement instead of silently
combining incompatible grids — mixing sketch widths would break the
one-sided-error guarantee undetectably. Build and probe share ONE
cell-projection helper; hash agreement between them is a correctness
invariant, not a copy-paste discipline.

Hashing: Spark's 64-bit xxhash64 seeded per row via a (token, row)
compound hash — deterministic, engine-native, no RNG.
"""

from __future__ import annotations

from functools import reduce
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CmsSketch(NamedTuple):
    """A count-min sketch: its cell table and the (d, w) it was built
    with. Absent cells are zero."""

    cells: DataFrame  # (row int, col int, cnt bigint)
    d: int
    w: int


# estimate joins/aggregates on these; candidate tables must not shadow them
_RESERVED = ("row", "col", "cnt", "est_n")


def _cell_array(token_col: str, d: int, w: int) -> Column:
    """The d (row, col) cells of a token — the ONE hashing definition
    shared by build and probe."""
    return F.array(
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


def count_min_sketch(df: DataFrame, token_col: str, d: int = 4, w: int = 1024) -> CmsSketch:
    """Build a d×w count-min sketch over the rows of ``df`` (one
    occurrence per row)."""
    cells = (
        df.select(F.explode(_cell_array(token_col, d, w)).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )
    return CmsSketch(cells, d, w)


def cms_merge(*sketches: CmsSketch) -> CmsSketch:
    """Merge sketches of corpus shards: cell-wise addition. All inputs
    must share (d, w) — mismatched grids raise instead of silently
    producing a meaningless cell table."""
    params = {(s.d, s.w) for s in sketches}
    if len(params) != 1:
        raise ValueError(f"cannot merge sketches with different (d, w): {sorted(params)}")
    unioned = reduce(lambda a, b: a.unionByName(b), (s.cells for s in sketches))
    merged = unioned.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    return CmsSketch(merged, *params.pop())


def cms_estimate(sketch: CmsSketch, candidates: DataFrame, token_col: str) -> DataFrame:
    """Point-estimate the frequency of each candidate token: min over
    its d cells (missing cell ⇒ 0 ⇒ token never seen), probing with
    the sketch's OWN (d, w). ``candidates`` is expected to be small (a
    watchlist); the sketch side is ≤ d·w rows, so Catalyst broadcasts
    whichever side is tinier — no large shuffle either way. Adds
    ``est_n`` to the candidate columns."""
    shadowed = set(candidates.columns) & set(_RESERVED)
    if shadowed:
        raise ValueError(
            f"candidate columns {sorted(shadowed)} collide with the sketch's "
            f"internal names {_RESERVED}; rename them before estimating"
        )
    # aggregate over a per-row id, not the visible columns, so duplicate
    # candidate rows come back as duplicates (cardinality is preserved —
    # the function's contract is "adds est_n to the candidate columns")
    rid = "__cms_rid"
    with_rid = candidates.withColumn(rid, F.monotonically_increasing_id())
    probes = with_rid.select(
        rid,
        *candidates.columns,
        F.explode(_cell_array(token_col, sketch.d, sketch.w)).alias("cell"),
    ).select(
        rid, *candidates.columns, F.col("cell.row").alias("row"), F.col("cell.col").alias("col")
    )
    joined = probes.join(sketch.cells, ["row", "col"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return (
        joined.groupBy(rid, *candidates.columns)
        .agg(F.min("cnt").alias("est_n"))
        .drop(rid)
    )
