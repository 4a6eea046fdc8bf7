"""Debug-log classification (P11 of SURVEY.md §2.3).

A record is "debug" when the parsed doc's top-level ``level`` equals
``"debug"`` OR the raw payload matches any ``--debug-log-patterns``
pattern (reference ``is_debug_log_in_json`` ``src/util.rs:158-164``,
``is_debug_log`` ``src/util.rs:140-148``; applied ``src/es.rs:339-344``).
Drives a metric counter only — records are never dropped for being
debug.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_debug_log(raw: Column | str, pattern: str | None = None) -> Column:
    """Boolean debug classification; ``pattern`` is the compiled
    alternation of all debug patterns (RegexSet ≡ one alternation)."""
    raw = F.col(raw) if isinstance(raw, str) else raw
    by_level = F.get_json_object(raw, "$.level") == "debug"
    if pattern is None:
        return F.coalesce(by_level, F.lit(False))
    return F.coalesce(by_level, F.lit(False)) | raw.rlike(pattern)
