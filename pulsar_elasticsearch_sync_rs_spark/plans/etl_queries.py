"""Reference-parity ETL operator queries over the ``events`` fixture,
each paired with a DuckDB oracle (SURVEY.md §7.3 declared-query plan).

The events fixture stands in for the Pulsar stream (FIXTURES.md):
``props`` ≈ raw payload, ``event_type`` ≈ topic, ``ts`` ≈ publish_time.
Where an operator needs input shapes the fixture lacks (dotted keys,
missing time-key, partitioned topic suffixes), BOTH sides synthesize
the same doctored payload deterministically from ``event_id`` — the
transform under test is still the engine's operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.config import PipelineConfig, RewriteRule
from pulsar_elasticsearch_sync_rs_spark.functions.debug import is_debug_log
from pulsar_elasticsearch_sync_rs_spark.functions.json_fns import (
    app_from_json,
    field_count,
    parse_json_map,
    sanitize_keys,
)
from pulsar_elasticsearch_sync_rs_spark.functions.rewrite import index_name, rewrite_index
from pulsar_elasticsearch_sync_rs_spark.functions.timestamps import at_timestamp, date_str
from pulsar_elasticsearch_sync_rs_spark.functions.topics import (
    strip_partition_suffix,
    topic_last_segment,
)
from pulsar_elasticsearch_sync_rs_spark.operators.filters import (
    filter_global_regex,
    filter_namespace_regex,
    filter_non_empty,
)
from pulsar_elasticsearch_sync_rs_spark.operators.rate_limit import rate_limit_per_second
from pulsar_elasticsearch_sync_rs_spark.operators.skew import spread_scan
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

# shared test config pieces (mirrored verbatim in the oracles)
GLOBAL_EXCLUDE = r'"k":\s*13\b'
NS_EXCLUDE_TOPIC = "click"
NS_EXCLUDE_PAT = r'"k":\s*[0-4]\d\b'
DEBUG_PAT = r'"k":\s*9\d\b'
REWRITE_RULES = (
    RewriteRule("sign", "auth"),
    RewriteRule("signup", "never"),  # shadowed by first-match-wins
    RewriteRule("click", "web.*"),  # ".*" stripped from target
    RewriteRule("view", "web"),
    RewriteRule("purchase", "commerce"),
)


def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3 — empty filter, global regex exclusion, per-topic
    exclusion. Narrow predicates, no shuffle; pushed to the scan."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", F.col("props").alias("value"), F.col("event_type").alias("topic_short")
    )
    df = filter_non_empty(ev, "value")
    df = filter_global_regex(df, GLOBAL_EXCLUDE, "value")
    df = filter_namespace_regex(df, {NS_EXCLUDE_TOPIC: NS_EXCLUDE_PAT}, "value", "topic_short")
    return df.select("event_id", "topic_short", "value")


ORACLE_FILTER_REGEX = rf"""
SELECT event_id, event_type AS topic_short, props AS value
FROM events
WHERE length(props) > 0
  AND NOT regexp_matches(props, '"k":\s*13\b')
  AND NOT (event_type = '{NS_EXCLUDE_TOPIC}' AND regexp_matches(props, '"k":\s*[0-4]\d\b'))
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P10 — typed point lookup and app extraction with default."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_value"),
        app_from_json("props").alias("app"),
    )


ORACLE_JSON_EXTRACT = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  coalesce(json_extract_string(props, '$.app'), '__DEFAULT_APP__') AS app
FROM events
"""


def q_key_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — recursive dot->underscore key sanitation (MapType lane).
    Dotted keys synthesized deterministically from the payload."""
    ev = read_table(spark, sf_dir, "events")
    doctored = F.replace(F.col("props"), F.lit('"k"'), F.lit('"k.sub.x"'))
    parsed = parse_json_map(doctored)
    keys = F.array_sort(F.map_keys(sanitize_keys(parsed)))
    return ev.select("event_id", F.array_join(keys, ",").alias("sanitized_keys"))


ORACLE_KEY_SANITIZE = """
SELECT event_id,
  array_to_string(list_sort(list_transform(
    json_keys(replace(props, '"k"', '"k.sub.x"')),
    x -> replace(x, '.', '_'))), ',') AS sanitized_keys
FROM events
"""


def q_timestamp_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P4 — @timestamp rule (time-key when numeric else publish
    time) and index date string. Every 3rd record carries the time key;
    the rest exercise the fallback branch."""
    ev = read_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 3 == 0, F.col("props")).otherwise(F.lit('{"nok":1}'))
    ts = at_timestamp(raw, "ts", time_key="k")
    return ev.select(
        "event_id",
        F.unix_millis(ts).alias("at_ms"),
        date_str("ts").alias("date_str"),
    )


ORACLE_TIMESTAMP_RULE = """
SELECT event_id,
  coalesce(
    CAST(CAST(json_extract_string(
      CASE WHEN event_id % 3 = 0 THEN props ELSE '{"nok":1}' END, '$.k') AS DOUBLE) AS BIGINT),
    epoch_ms(ts)) AS at_ms,
  strftime(ts, '%Y.%m.%d') AS date_str
FROM events
"""


def q_topic_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6 — URI last-segment extraction + partitioned-topic suffix
    strip, over synthesized full Pulsar topic URIs."""
    ev = read_table(spark, sf_dir, "events")
    uri = F.concat(
        F.lit("persistent://public/default/"),
        F.col("event_type"),
        F.lit("-partition-"),
        (F.col("event_id") % 4).cast("string"),
    )
    short = topic_last_segment(uri)
    return ev.select(
        "event_id",
        short.alias("topic_short"),
        strip_partition_suffix(short).alias("topic_base"),
    )


ORACLE_TOPIC_STRIP = r"""
SELECT event_id,
  event_type || '-partition-' || CAST(event_id % 4 AS VARCHAR) AS topic_short,
  event_type AS topic_base
FROM events
"""


def q_index_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P9(+P6) — ordered first-match rewrite rules (anchored ^,
    ".*"-stripped targets, fallthrough) + dated index name."""
    ev = read_table(spark, sf_dir, "events")
    topic = F.concat(F.col("event_type"), F.lit("-partition-"), (F.col("event_id") % 4).cast("string"))
    idx = index_name(rewrite_index(topic, REWRITE_RULES), date_str("ts"))
    return ev.select("event_id", idx.alias("index_name"))


ORACLE_INDEX_REWRITE = """
SELECT event_id,
  CASE WHEN regexp_matches(event_type, '^sign') THEN 'auth'
       WHEN regexp_matches(event_type, '^signup') THEN 'never'
       WHEN regexp_matches(event_type, '^click') THEN 'web'
       WHEN regexp_matches(event_type, '^view') THEN 'web'
       WHEN regexp_matches(event_type, '^purchase') THEN 'commerce'
       ELSE event_type END
  || '-' || strftime(ts, '%Y.%m.%d') AS index_name
FROM events
"""


def q_debug_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+G3 — debug classification feeding per-topic counters."""
    ev = read_table(spark, sf_dir, "events")
    dbg = is_debug_log("props", DEBUG_PAT)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(dbg, 1).otherwise(0)).alias("n_debug"),
        )
    )


ORACLE_DEBUG_CLASSIFY = r"""
SELECT event_type,
  count(*) AS n_total,
  CAST(sum(CASE WHEN coalesce(json_extract_string(props,'$.level') = 'debug', false)
                  OR regexp_matches(props, '"k":\s*9\d\b') THEN 1 ELSE 0 END) AS BIGINT) AS n_debug
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_field_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — top-level key count of the parsed doc (gauge input)."""
    ev = read_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 2 == 0,
        F.replace(F.col("props"), F.lit("}"), F.lit(',"extra":1,"another":2}')),
    ).otherwise(F.col("props"))
    return ev.select("event_id", field_count(parse_json_map(raw)).alias("n_fields"))


ORACLE_FIELD_COUNT = """
SELECT event_id,
  CAST(len(json_keys(
    CASE WHEN event_id % 2 = 0
         THEN replace(props, '}', ',"extra":1,"another":2}')
         ELSE props END)) AS INTEGER) AS n_fields
FROM events
"""


def q_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G3 — the BufferMap shape: counts per (app, dated index)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select(
            app_from_json("props").alias("app"),
            index_name(F.col("event_type"), date_str("ts")).alias("index_name"),
        )
        .groupBy("app", "index_name")
        .agg(F.count("*").alias("n_records"))
    )


ORACLE_GROUP_COUNTS = """
SELECT coalesce(json_extract_string(props,'$.app'), '__DEFAULT_APP__') AS app,
  event_type || '-' || strftime(ts, '%Y.%m.%d') AS index_name,
  count(*) AS n_records
FROM events
GROUP BY 1, 2
ORDER BY app, index_name
"""


RATE_LIMITED_APPS = {f"app_{i}": 2 for i in range(10)}  # apps 0..9 capped at 2/s


def q_rate_limit_gcra(spark, sf_dir):
    """R1, exact-GCRA lane (reference governor crate parity,
    src/ratelimiter.rs:43-57): burst N then smooth 1/N-second spacing,
    sequential recurrence per app via applyInPandas. Deterministic but
    not SQL-expressible (per-row state recurrence) → rows-only;
    behavior pinned by five pytest traces including the
    window-boundary contrast with the fixed-window lane."""
    from pulsar_elasticsearch_sync_rs_spark.operators.rate_limit import rate_limit_gcra

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("app_"), F.col("user_id").cast("string")).alias("app"),
        F.col("ts"),
    )
    kept = rate_limit_gcra(ev, RATE_LIMITED_APPS, app="app", ts="ts", tiebreaker="event_id")
    return kept.select("event_id", "app")


def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 — keyed per-second cap: apps app_0..app_9 keep ≤2 records
    per second (arrival order, event_id tiebreak); other apps
    unlimited (reference semantics: unconfigured apps pass)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("app_"), F.col("user_id").cast("string")).alias("app"),
        F.col("ts"),
    )
    kept = rate_limit_per_second(ev, RATE_LIMITED_APPS, app="app", ts="ts", tiebreaker="event_id")
    return kept.select("event_id", "app")


ORACLE_RATE_LIMIT = """
SELECT event_id, 'app_' || CAST(user_id AS VARCHAR) AS app FROM (
  SELECT event_id, user_id,
    row_number() OVER (PARTITION BY user_id, date_trunc('second', ts)
                       ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE user_id >= 10 OR rn <= 2
"""


def q_uuid_inject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — UUID lineage injection (nondeterministic value → rows-only
    check: driver verifies row count and schema; pytest asserts
    non-null + uniqueness)."""
    ev = read_table(spark, sf_dir, "events")
    cfg = PipelineConfig(inject_key=True)
    return ev.select("event_id").withColumn(cfg.injected_field, F.expr("uuid()"))


def q_etl_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL reference-parity chain end-to-end as one declared,
    oracle-checked query: F1+F2+F3 filters → P1 parse → P3/P4
    timestamps → P8/P9 index rewrite+naming → P10 app → P11 debug →
    P12 field count → R1 rate cap → G1 (app,index) grouping. This is
    the flagship (entry()) with a deterministic oracle twin."""
    from pulsar_elasticsearch_sync_rs_spark.plans.pipeline import etl_transform
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import events_as_stream_records

    cfg = PipelineConfig(
        global_filters=(GLOBAL_EXCLUDE,),
        namespace_filters={NS_EXCLUDE_TOPIC: (NS_EXCLUDE_PAT,)},
        rewrite_rules=REWRITE_RULES,
        debug_log_patterns=(DEBUG_PAT,),
        rate_limits={"__DEFAULT_APP__": 2},
    )
    # the whole filter->parse->sanitize->rewrite chain is narrow and
    # otherwise runs in the scan's ONE task on the single-row-group
    # fixture — spread first (guide §2.5; no-op at real file counts)
    records = spread_scan(events_as_stream_records(spark, sf_dir), "event_id")
    out = etl_transform(records, cfg, tiebreaker="event_id")
    return (
        out.groupBy("app", "index")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("is_debug"), 1).otherwise(0)).alias("n_debug"),
            F.sum("n_fields").alias("total_fields"),
            # min/max over the TIMESTAMP, rendered after the agg: string
            # agg buffers force SortAggregate (two extra sorts); long
            # buffers keep it a HashAggregate. Identical values — the
            # fixed-width rendering is order-preserving, and time_key is
            # unset in this cfg so at_timestamp == rendered publish_time.
            F.date_format(F.min("publish_time"), "yyyy-MM-dd'T'HH:mm:ssXXX").alias("first_ts"),
            F.date_format(F.max("publish_time"), "yyyy-MM-dd'T'HH:mm:ssXXX").alias("last_ts"),
        )
        .withColumnRenamed("index", "index_name")
    )


ORACLE_ETL_CHAIN = r"""
WITH filtered AS (
  SELECT event_id, user_id, ts, event_type, props
  FROM events
  WHERE length(props) > 0
    AND NOT regexp_matches(props, '"k":\s*13\b')
    AND NOT (event_type = 'click' AND regexp_matches(props, '"k":\s*[0-4]\d\b'))
), enriched AS (
  SELECT *,
    coalesce(json_extract_string(props, '$.app'), '__DEFAULT_APP__') AS app,
    CASE WHEN regexp_matches(event_type, '^sign') THEN 'auth'
         WHEN regexp_matches(event_type, '^signup') THEN 'never'
         WHEN regexp_matches(event_type, '^click') THEN 'web'
         WHEN regexp_matches(event_type, '^view') THEN 'web'
         WHEN regexp_matches(event_type, '^purchase') THEN 'commerce'
         ELSE event_type END
      || '-' || strftime(ts, '%Y.%m.%d') AS index_name,
    (coalesce(json_extract_string(props, '$.level') = 'debug', false)
      OR regexp_matches(props, '"k":\s*9\d\b')) AS is_debug,
    len(json_keys(props)) AS n_fields,
    strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS at_ts_str
  FROM filtered
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY app, date_trunc('second', ts)
    ORDER BY ts ASC, event_id ASC) AS rn
  FROM enriched
), kept AS (
  -- the engine's limiter is keyed: only apps present in rate_limits
  -- ({'__DEFAULT_APP__': 2}) are capped; others pass through
  SELECT * FROM ranked WHERE app <> '__DEFAULT_APP__' OR rn <= 2
)
SELECT app, index_name,
  count(*) AS n_docs,
  CAST(sum(CASE WHEN is_debug THEN 1 ELSE 0 END) AS BIGINT) AS n_debug,
  CAST(sum(n_fields) AS BIGINT) AS total_fields,
  min(at_ts_str) AS first_ts,
  max(at_ts_str) AS last_ts
FROM kept
GROUP BY app, index_name
ORDER BY app, index_name
"""


def q_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 improvement path — parse-validity split with a dead-letter
    lane instead of the reference's silent drop (``src/es.rs:374-377``).
    Every 7th payload is deterministically corrupted on BOTH sides;
    output: good/dead counts per topic."""
    from pulsar_elasticsearch_sync_rs_spark.operators.filters import dead_letter_split

    ev = read_table(spark, sf_dir, "events")
    doctored = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 3)).otherwise(
            F.col("props")
        ),
    )
    good, dead = dead_letter_split(doctored, "value")
    return (
        good.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_good"))
        .join(
            dead.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_dead")),
            "event_type",
            "full_outer",
        )
        .select(
            "event_type",
            F.coalesce("n_good", F.lit(0)).alias("n_good"),
            F.coalesce("n_dead", F.lit(0)).alias("n_dead"),
        )
    )


ORACLE_DEAD_LETTER = """
SELECT event_type,
  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
  CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_dead
FROM (
  SELECT event_type,
    json_valid(CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 3) ELSE props END) AS ok
  FROM events
)
GROUP BY event_type
"""
