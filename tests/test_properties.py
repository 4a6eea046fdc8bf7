"""Property-based tests (hypothesis): the Spark operators agree with
simple Python reference models on randomized inputs.

These run each case batch through ONE Spark job over a generated
DataFrame — settings keep example counts small since each draw costs a
Spark round trip."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from pulsar_elasticsearch_sync_rs_spark.config import RewriteRule
from pulsar_elasticsearch_sync_rs_spark.functions.rewrite import rewrite_index
from pulsar_elasticsearch_sync_rs_spark.operators.rate_limit import rate_limit_per_second

TOPIC_ALPHA = "abcde-"
topics = st.text(alphabet=TOPIC_ALPHA, min_size=1, max_size=12)
patterns = st.text(alphabet="abcde", min_size=1, max_size=4)


def model_rewrite(topic: str, rules: list[RewriteRule]) -> str:
    """Python model of the reference semantics: strip -partition-N,
    anchored first match wins, '.*' stripped from target, fallthrough."""
    base = re.sub(r"-partition-\d+$", "", topic)
    for r in rules:
        pat = r.pattern if r.pattern.startswith("^") else "^" + r.pattern
        if re.search(pat, base):
            return r.target.replace(".*", "")
    return base


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(topics, min_size=1, max_size=8),
    st.lists(
        st.tuples(patterns, st.text(alphabet="xyz.*", min_size=1, max_size=6)),
        min_size=0,
        max_size=5,
    ),
    st.integers(min_value=0, max_value=9),
)
def test_rewrite_matches_model(spark_global, topic_list, rule_tuples, part_n):
    spark = spark_global
    rules = tuple(RewriteRule(p, t) for p, t in rule_tuples)
    full_topics = [t + (f"-partition-{part_n}" if i % 2 else "") for i, t in enumerate(topic_list)]
    df = spark.createDataFrame([Row(topic=t) for t in full_topics])
    got = {
        r["topic"]: r["idx"]
        for r in df.withColumn("idx", rewrite_index("topic", rules)).collect()
    }
    for t in full_topics:
        assert got[t] == model_rewrite(t, list(rules)), (t, rules)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # app
            st.integers(min_value=0, max_value=5),  # second bucket
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=3),  # limit
)
def test_rate_limit_cap_invariant(spark_global, events, limit):
    spark = spark_global
    rows = [
        Row(event_id=i, app=app, ts=f"2024-01-01 00:00:0{sec}")
        for i, (app, sec) in enumerate(events)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    kept = rate_limit_per_second(df, {"a": limit, "b": limit}, tiebreaker="event_id").collect()
    # invariant 1: configured apps never exceed limit per second
    from collections import Counter

    per_bucket = Counter((r["app"], r["ts"]) for r in kept)
    for (app, ts), n in per_bucket.items():
        if app in ("a", "b"):
            assert n <= limit, (app, ts, n, limit)
    # invariant 2: unconfigured app c passes everything
    n_c_in = sum(1 for app, _ in events if app == "c")
    assert sum(1 for r in kept if r["app"] == "c") == n_c_in
    # invariant 3: kept set is the deterministic earliest-by-id prefix
    expect_kept = set()
    counts: Counter = Counter()
    for i, (app, sec) in enumerate(events):  # event_id order == arrival
        if app == "c":
            expect_kept.add(i)
        elif counts[(app, sec)] < limit:
            counts[(app, sec)] += 1
            expect_kept.add(i)
    assert {r["event_id"] for r in kept} == expect_kept
