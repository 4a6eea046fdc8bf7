"""pulsar_elasticsearch_sync_rs_spark — a PySpark-native streaming ETL
and analytics engine with the capabilities of
lichuan6/pulsar-elasticsearch-sync-rs (reference at /root/reference/),
re-expressed Spark-first.

Layers
------
- ``config``     — :class:`PipelineConfig`, mirroring the reference's CLI
                   flag surface (reference ``src/args.rs:58-164``).
- ``functions``  — pure column-level expressions (JSON parse, key
                   sanitation, timestamp rules, topic handling, index
                   rewrite, text analysis, vector math).
- ``operators``  — DataFrame -> DataFrame transforms (filters, rate
                   limiting, grouping, dedup, similarity, multimodal).
- ``plans``      — composed pipelines: the reference-parity ETL chain and
                   the extended analytics pack.
- ``sources``    — batch + streaming readers over the test fixtures and
                   (optionally) a real Pulsar connector.
- ``streaming``  — Structured Streaming runner, bulk-style sinks,
                   metrics observation.

Every operator is a *batch-testable* function; streaming wraps the same
chain in ``readStream -> writeStream`` (the Structured Streaming model).
"""

from pulsar_elasticsearch_sync_rs_spark.config import PipelineConfig
from pulsar_elasticsearch_sync_rs_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]

__version__ = "0.1.0"
