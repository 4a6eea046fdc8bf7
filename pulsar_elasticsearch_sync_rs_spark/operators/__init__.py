"""DataFrame -> DataFrame operators (SURVEY.md §2.2/§2.4/§2.5 + the
extended §2.9 surface: dedup, similarity, multimodal)."""

from pulsar_elasticsearch_sync_rs_spark.operators.filters import (
    filter_global_regex,
    filter_namespace_regex,
    filter_non_empty,
    filter_parseable_json,
)
from pulsar_elasticsearch_sync_rs_spark.operators.rate_limit import rate_limit_per_second
from pulsar_elasticsearch_sync_rs_spark.operators.grouping import group_counts

__all__ = [
    "filter_global_regex",
    "filter_namespace_regex",
    "filter_non_empty",
    "filter_parseable_json",
    "rate_limit_per_second",
    "group_counts",
]
