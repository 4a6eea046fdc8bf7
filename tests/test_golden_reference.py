"""The reference's three inline unit tests, ported as goldens
(SURVEY.md §5): time-key rule (es.rs:380-393), index rewrite table
(es.rs:395-432), debug-log classification (util.rs:174-187)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.config import RewriteRule
from pulsar_elasticsearch_sync_rs_spark.functions.debug import is_debug_log
from pulsar_elasticsearch_sync_rs_spark.functions.rewrite import rewrite_index
from pulsar_elasticsearch_sync_rs_spark.functions.timestamps import at_timestamp, rfc3339


def test_time_key_rule(spark):
    """reference src/es.rs:380-393: {"ts": 1626057993894.9734} with
    time_key="ts" -> @timestamp starts 2021-07-12T02:46:33 (UTC);
    without time_key -> publish_time passthrough."""
    df = spark.createDataFrame(
        [Row(value='{"ts": 1626057993894.9734, "name": "hi"}')]
    ).withColumn("publish_time", F.timestamp_millis(F.lit(1600000000000)))

    with_key = df.select(
        rfc3339(at_timestamp("value", "publish_time", time_key="ts")).alias("at")
    ).first()["at"]
    assert with_key.startswith("2021-07-12T02:46:33")

    without_key = df.select(
        rfc3339(at_timestamp("value", "publish_time", time_key=None)).alias("at")
    ).first()["at"]
    assert without_key.startswith("2020-09-13T12:26:40")

    # non-numeric / absent time key falls back to publish_time
    fallback = df.select(
        rfc3339(at_timestamp("value", "publish_time", time_key="name")).alias("at")
    ).first()["at"]
    assert fallback.startswith("2020-09-13T12:26:40")


# the 9-rule table from reference src/es.rs:399-409
RULES = (
    RewriteRule("k8s-be", "k8s-be"),
    RewriteRule("k8s-fe", "k8s-fe"),
    RewriteRule("app-biz", "app"),
    RewriteRule("app", "app"),
    RewriteRule("nginx-live", "nginx"),
    RewriteRule("live-", "live"),
    RewriteRule("mysql-slowlogs", "mysql"),
    RewriteRule("containerlog-", "containerlog"),
    RewriteRule("pulsar", "pulsar.*"),
)

# the 11-topic golden table from reference src/es.rs:411-431
GOLDEN = [
    ("k8s-be-prod", "k8s-be"),
    ("k8s-fe-prod", "k8s-fe"),
    ("app-biz", "app"),
    ("app-other", "app"),
    ("nginx-live-x", "nginx"),
    ("live-stream", "live"),
    ("mysql-slowlogs-db1", "mysql"),
    ("containerlog-abc", "containerlog"),
    ("pulsar-partition-0", "pulsar"),  # P6 partition strip feeds P8
    ("logstash", "logstash"),  # fallthrough: unchanged
    ("app-biz-2", "app"),  # first-match-wins over later rules
]


def test_rewrite_index_table(spark):
    df = spark.createDataFrame([Row(topic=t) for t, _ in GOLDEN])
    out = {
        r["topic"]: r["idx"]
        for r in df.withColumn("idx", rewrite_index("topic", RULES)).collect()
    }
    for topic, expect in GOLDEN:
        assert out[topic] == expect, f"{topic}: {out[topic]} != {expect}"


def test_is_debug_log(spark):
    """reference src/util.rs:174-187: [DEBU]/[Gin-debug] bracketed
    patterns match; unbracketed forms don't; JSON level==debug matches."""
    pattern = r"(\[DEBU\])|(\[Gin-debug\])"
    cases = [
        ("[DEBU] starting worker", True),
        ("[Gin-debug] GET /ping", True),
        ("DEBU starting worker", False),
        ("Gin-debug GET /ping", False),
        ('{"level": "debug", "msg": "x"}', True),
        ('{"level": "info", "msg": "x"}', False),
        ("plain line", False),
    ]
    df = spark.createDataFrame([Row(value=v) for v, _ in cases])
    out = {
        r["value"]: r["dbg"]
        for r in df.withColumn("dbg", is_debug_log("value", pattern)).collect()
    }
    for value, expect in cases:
        assert out[value] == expect, f"{value!r}: {out[value]} != {expect}"
