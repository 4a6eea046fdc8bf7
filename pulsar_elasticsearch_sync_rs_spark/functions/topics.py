"""Topic-name handling (P5, P6 of SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PARTITION_SUFFIX_RE = r"-partition-\d+$"  # reference src/es.rs:26-29


def topic_last_segment(topic: Column | str) -> Column:
    """P5 — ``persistent://tenant/ns/topic`` -> ``topic``
    (reference ``src/util.rs:50-57``)."""
    topic = F.col(topic) if isinstance(topic, str) else topic
    return F.element_at(F.split(topic, "/"), -1)


def strip_partition_suffix(topic: Column | str) -> Column:
    """P6 — ``foo-partition-3`` -> ``foo``
    (reference ``src/es.rs:26-29,250-259``)."""
    topic = F.col(topic) if isinstance(topic, str) else topic
    return F.regexp_replace(topic, PARTITION_SUFFIX_RE, "")
