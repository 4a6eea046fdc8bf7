"""Skew-resistant aggregation — salting, the standard remedy when one
hot key would pin a single reducer (SURVEY.md §7.4 100 TB posture;
complements AQE's runtime skew-join splitting).

Two-phase: add a deterministic salt derived from a high-cardinality
column, pre-aggregate on (key, salt) — spreading the hot key over
``n_salts`` reducers — then final-aggregate on key. Result identical
to the direct groupBy; cost is one extra (tiny) shuffle of partial
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_expr(salt_from: str, n_salts: int):
    """Deterministic per-row salt in [0, n_salts). NULL salt_from
    coalesces to salt 0 — a NULL would never equal any replica's salt
    in salted_join and silently drop the row; for the aggregations it
    merely renames NULL's group, which is harmless."""
    salt = F.pmod(F.crc32(F.col(salt_from).cast("string").cast("binary")), F.lit(n_salts))
    return F.coalesce(salt, F.lit(0))


def salted_count(
    df: DataFrame, key: str, salt_from: str, n_salts: int = 16
) -> DataFrame:
    """count(*) per key, hot-key-safe. ``salt_from`` must be a column
    with per-row variation (an id) so the salt is deterministic —
    rand() would break retry/replay determinism."""
    partial = (
        df.withColumn("__salt", _salt_expr(salt_from, n_salts))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n_records"))


def salted_sum(
    df: DataFrame, key: str, value_expr, salt_from: str, n_salts: int = 16
) -> DataFrame:
    """sum(value_expr) per key via the same two-phase spread."""
    partial = (
        df.withColumn("__salt", _salt_expr(salt_from, n_salts))
        .groupBy(key, "__salt")
        .agg(F.sum(value_expr).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("total"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join for when the dim side is too big to
    broadcast AND the fact side has hot keys: salt the fact rows
    deterministically (spreading each hot key over ``n_salts`` shuffle
    partitions) and REPLICATE each dim row once per salt value, then
    join on (key, salt). Result identical to the plain join; cost is
    an n_salts× blow-up of the (smaller) dim side's shuffle — the
    classic trade when AQE's runtime skew splitting isn't available
    (e.g. inside a stream-static join, where AQE is disabled).

    Column names must be disjoint apart from ``key``. ``how`` supports
    inner/left joins (fact side preserved)."""
    overlap = (set(fact.columns) & set(dim.columns)) - {key}
    if overlap:
        raise ValueError(f"fact/dim column names must be disjoint; both have {sorted(overlap)}")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"how must be inner or left[_outer], got {how!r}")
    if "__salt" in fact.columns or "__salt" in dim.columns:
        raise ValueError("__salt is reserved by salted_join; rename that column first")
    f_salted = fact.withColumn("__salt", _salt_expr(salt_from, n_salts))
    d_replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f_salted.join(d_replicated, [key, "__salt"], how).drop("__salt")


def spread_scan(df: DataFrame, *by: str) -> DataFrame:
    """Input-skew remedy for unsplittable scans (optimization guide
    §2.5: "one huge unsplittable file ... repartition immediately
    after the read"). The driver fixtures are SINGLE-ROW-GROUP parquet
    files, so a scan is one non-empty task and every pre-exchange
    operator riding it — Arrow decode kernels, regex gates, shingle
    explodes, JSON parsing — runs serially no matter how many cores
    the session has (measured round 15: the progressive-JPEG lane ran
    3.2× faster once spread).

    Scale-adaptive, not a constant: repartitions up to the session's
    ``defaultParallelism`` ONLY when the plan currently has fewer
    partitions. At production file counts (a 100 TB corpus is tens of
    thousands of row groups) the check is a no-op, so this never adds
    a gratuitous full-corpus shuffle at scale; at fixture/driver scale
    the one tiny exchange buys full-width parallelism for everything
    downstream. Pass ``by`` columns for deterministic hash placement
    (e.g. the id the next operator groups on); default is round-robin
    (exact balance; retry-deterministic via Spark's
    sort-before-repartition).
    """
    n = int(df.sparkSession.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in by]) if by else df.repartition(n)


def no_pushdown(pred):
    """Pin an expensive predicate ABOVE :func:`spread_scan`'s exchange.

    Catalyst's PushDownPredicate treats a repartition as row-preserving
    and relocates every DETERMINISTIC filter below it — splitting AND
    conjunctions to move each conjunct separately — so a
    ``spread_scan(df).filter(expensive_gate)`` chain evaluates the gate
    on the pre-spread partitioning: on the single-row-group driver
    fixtures that is ONE task running the whole text gate serially (and
    re-running it serially inside every broadcast build that re-executes
    the subtree). Measured on q_llm_pipeline's gate at sf0.1: the
    gate+spread subchain drops 0.89 → 0.34 s once the filter stays above
    the exchange.

    The wrapper returns a SINGLE expression the optimizer can neither
    split nor reorder: a ``when()`` whose condition is non-deterministic
    (``monotonically_increasing_id() >= 0`` — a tautology, the id is
    non-negative by construction), so the predicate's VALUE is exactly
    ``pred`` (including NULL → row dropped, same as a bare filter) while
    its placement is wherever the caller wrote it.

    Where pushdown is DESIRABLE — filters that prune the scan
    (partition/row-group pruning) or shrink the exchange — do NOT wrap:
    this is only for predicates whose evaluation cost exceeds the bytes
    they would save the exchange, sitting on an under-parallel scan.
    Note it also stops OTHER deterministic filters chained above from
    pushing past it (non-deterministic expressions pin ordering), so
    wrap the outermost expensive gate only.

    BATCH plans only: streaming's UnsupportedOperationChecker rejects
    ``monotonically_increasing_id`` outright (it would need
    partition-offset state). Guard call sites shared with streaming on
    ``df.isStreaming`` — a stream has no exchange below the filter for
    the predicate to be pushed under, so the bare predicate is already
    the right shape there (plans/pipeline.py shows the pattern).
    foreachBatch bodies are batch plans and may use this freely.
    """
    return F.when(
        F.monotonically_increasing_id() >= 0, pred
    ).otherwise(F.lit(False))


def evaluate_once(col):
    """Pin an expensive PROJECTED column to one evaluation per row.

    A filter on a derived column gets pushed back through its
    projection with the defining expression RE-INLINED into the filter
    condition (PushDownPredicate substitutes deterministic project
    fields), so ``select(expensive.alias("q")).filter(col("q") >= t)``
    evaluates `expensive` TWICE per row — once in the pushed filter,
    once in the projection that outputs it. Measured on
    q_corpus_curation: the quality aggregate appeared in both Filter
    and Project nodes.

    Wrapping the projected expression in a non-deterministic tautology
    blocks both mechanisms: PushDownPredicate refuses to substitute a
    non-deterministic field (the filter stays above, referencing the
    attribute), and CollapseProject never duplicates a
    non-deterministic expression into multiple consumers. Value
    identical — the guard is always true.

    Guard choice (measured, see OPTIMIZATION_r15.md change 18): a bare
    ``rand() >= lit`` comparison is RANGE-FOLDED away by Spark 4;
    routing the draw through an Add defeats the fold; rand is
    streaming-legal (unlike monotonically_increasing_id, so this
    helper is safe on streaming plans too). Cost: one RNG draw per
    row — noise next to any expression worth wrapping. Use only on
    expressions whose single evaluation outweighs losing
    filter-pushdown through them (never on pruning predicates).

    SCHEMA NOTE (round-15 ADVICE): the wrapper is a ``when`` with no
    ``otherwise``, so the wrapped column's schema is NULLABLE even if
    the inner expression was provably non-null (e.g. it ended in
    ``.otherwise(lit(0.0))``). Values never change — the guard is
    always true — but strict-schema consumers (writers with enforced
    schemas, nullability asserts) of a wrapped column see
    nullable=true where the bare expression read false. None of this
    repo's consumers assert non-null on a wrapped column (oracle
    checks compare values/dtypes, not nullability); re-check that
    before wrapping a column feeding an external strict-schema sink.
    """
    return F.when((F.rand(0) + F.lit(2.0)) >= F.lit(1.0), col)
