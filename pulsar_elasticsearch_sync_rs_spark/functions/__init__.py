"""Column-level expression builders — the scalar operators P1-P12 of
SURVEY.md §2.3 plus text/vector helpers for the extended surface.

Everything here returns :class:`pyspark.sql.Column` built from
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd). No Python
UDFs on these paths.
"""

from pulsar_elasticsearch_sync_rs_spark.functions.json_fns import (
    app_from_json,
    field_count,
    parse_json_map,
    sanitize_keys,
)
from pulsar_elasticsearch_sync_rs_spark.functions.timestamps import (
    at_timestamp,
    date_str,
    rfc3339,
)
from pulsar_elasticsearch_sync_rs_spark.functions.topics import (
    strip_partition_suffix,
    topic_last_segment,
)
from pulsar_elasticsearch_sync_rs_spark.functions.rewrite import (
    index_name,
    rewrite_index,
)
from pulsar_elasticsearch_sync_rs_spark.functions.debug import is_debug_log

__all__ = [
    "app_from_json",
    "field_count",
    "parse_json_map",
    "sanitize_keys",
    "at_timestamp",
    "date_str",
    "rfc3339",
    "strip_partition_suffix",
    "topic_last_segment",
    "index_name",
    "rewrite_index",
    "is_debug_log",
]
