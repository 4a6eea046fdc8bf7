"""Exclusion filters F1-F4 (SURVEY.md §2.2). Match ⇒ drop.

All four are narrow, shuffle-free predicates evaluated inside
whole-stage codegen; Catalyst is free to reorder/push them into the
scan. The reference runs the raw-string regex filters BEFORE JSON parse
(cheap-first ordering, ``src/pulsar.rs:246-275`` vs ``src/es.rs:338``)
— declaratively the same plan falls out, since the regex predicates
don't depend on the parsed column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.functions.json_fns import parse_json_map


def filter_non_empty(df: DataFrame, raw: str = "value") -> DataFrame:
    """F1 — drop empty payloads (reference ``src/pulsar.rs:241-244``)."""
    return df.filter(F.length(F.col(raw)) > 0)


def filter_global_regex(df: DataFrame, pattern: str | None, raw: str = "value") -> DataFrame:
    """F2 — drop records whose raw payload matches the global exclusion
    alternation (reference RegexSet ``src/util.rs:59-73``, applied
    ``src/pulsar.rs:246-252``)."""
    if not pattern:
        return df
    return df.filter(~F.col(raw).rlike(pattern))


def filter_namespace_regex(
    df: DataFrame,
    patterns_by_topic: dict[str, str],
    raw: str = "value",
    topic: str = "topic",
) -> DataFrame:
    """F3 — per-topic exclusion: a record is dropped iff its topic has a
    pattern set AND the raw payload matches (reference
    ``src/pulsar.rs:264-275``, map built ``src/util.rs:75-101``).

    The rule table is bounded config, so it compiles into one chained
    CASE expression — no join, no broadcast variable, no shuffle.
    """
    if not patterns_by_topic:
        return df
    topic_col, raw_col = F.col(topic), F.col(raw)
    drop: Column = F.lit(False)
    for t, pat in patterns_by_topic.items():
        drop = F.when((topic_col == t) & raw_col.rlike(pat), F.lit(True)).otherwise(drop)
    return df.filter(~drop)


def filter_parseable_json(
    df: DataFrame, raw: str = "value", parsed_out: str | None = None
) -> DataFrame:
    """F4 — drop payloads that fail JSON parse (reference drops them
    with no dead-letter, ``src/es.rs:338,374-377``). Optionally keeps
    the parsed map as ``parsed_out`` so downstream operators reuse one
    ``from_json`` (Catalyst dedups common subexpressions anyway)."""
    parsed = parse_json_map(F.col(raw))
    if parsed_out:
        df = df.withColumn(parsed_out, parsed)
        return df.filter(F.col(parsed_out).isNotNull())
    return df.filter(parsed.isNotNull())


def dead_letter_split(
    df: DataFrame, raw: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Improvement over the reference (SURVEY.md F4 row): route
    unparseable payloads to a dead-letter lane instead of silently
    dropping. Returns (good, dead)."""
    parsed = parse_json_map(F.col(raw))
    return df.filter(parsed.isNotNull()), df.filter(parsed.isNull())
