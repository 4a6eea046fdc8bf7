"""Timestamp derivation (P3, P4 of SURVEY.md §2.3).

The reference emits ``@timestamp`` as an RFC3339 *string*:
- if ``--time-key`` is set and that field is a JSON number (f64
  epoch-ms), convert it (UTC) — reference ``src/es.rs:51-73``;
- else use the Pulsar publish_time (reference ``src/es.rs:84-97``).

It also derives a ``%Y.%m.%d`` date string from publish_time for index
naming (reference ``src/util.rs:35-48``; its nanosecond math is buggy,
so second precision is the pinned contract — SURVEY.md P4 row). We run
with ``spark.sql.session.timeZone=UTC`` so both branches render UTC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RFC3339_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"
DATE_FMT = "yyyy.MM.dd"  # reference src/util.rs:47


def time_key_ts(raw: Column | str, time_key: str) -> Column:
    """Epoch-ms JSON-number field -> timestamp, NULL if absent/non-numeric
    (reference ``get_time_key`` ``src/es.rs:60-73`` + ``f64_to_datetime``
    ``src/es.rs:51-58``)."""
    raw = F.col(raw) if isinstance(raw, str) else raw
    # try_cast: a non-numeric time-key value means "field absent" in the
    # reference (falls back to publish_time, src/es.rs:60-73); ANSI-mode
    # cast would instead abort the query on the first bad record.
    millis = F.get_json_object(raw, f"$.{time_key}").try_cast("double")
    # timestamp_millis takes a long; keep sub-ms truncation identical to
    # the reference (it floors to ms via f64 -> i64, src/es.rs:53-55).
    return F.timestamp_millis(millis.try_cast("long"))


def time_key_ts_from_map(parsed_map: Column, time_key: str) -> Column:
    """:func:`time_key_ts` over the already-parsed map — identical
    semantics (map values are the JSON literals as strings, so the
    try_cast accepts exactly what ``get_json_object`` would return)
    without re-parsing the raw payload."""
    millis = F.element_at(parsed_map, time_key).try_cast("double")
    return F.timestamp_millis(millis.try_cast("long"))


def at_timestamp(
    raw: Column | str,
    publish_time: Column | str,
    time_key: str | None,
    parsed_map: Column | None = None,
) -> Column:
    """P3 — the ``@timestamp`` rule: time-key field when numeric, else
    publish_time (reference ``src/es.rs:84-97``). Returns TimestampType;
    render with :func:`rfc3339` for string-typed parity. Pass
    ``parsed_map`` to reuse an existing ``from_json`` pass instead of
    re-parsing ``raw``."""
    publish_time = F.col(publish_time) if isinstance(publish_time, str) else publish_time
    if time_key is None:
        return publish_time
    if parsed_map is not None:
        return F.coalesce(time_key_ts_from_map(parsed_map, time_key), publish_time)
    return F.coalesce(time_key_ts(raw, time_key), publish_time)


def rfc3339(ts: Column) -> Column:
    """Render a timestamp as an RFC3339 string (UTC, second precision —
    the pinned contract per SURVEY.md §7.4)."""
    return F.date_format(ts, RFC3339_FMT)


def date_str(ts: Column | str, tz: str | None = None) -> Column:
    """P4 — ``yyyy.MM.dd`` date string for index naming
    (reference ``src/util.rs:35-48``).

    The reference renders this in the HOST-LOCAL timezone
    (``Local.timestamp_millis``, ``src/util.rs:45-46``), so a doc
    published at 23:30 EST lands in that local date's index. Default
    here is UTC (deterministic, host-independent — the documented
    strict upgrade); pass ``tz`` (an IANA name via
    ``PipelineConfig.render_tz``) to reproduce the reference's
    local-date bucketing exactly: ``convert_timezone`` shifts to the
    target wall clock (DST-correct per timestamp) before formatting."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    if tz is not None:
        ts = F.convert_timezone(F.lit("UTC"), F.lit(tz), ts)
    return F.date_format(ts, DATE_FMT)
