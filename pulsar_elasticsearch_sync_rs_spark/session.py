"""SparkSession factory tuned for the engine.

Local-mode testing runs on ``local[N]``; the same settings are what we
would ship cluster-side (AQE on, UTC session TZ, Arrow for the few
Pandas-UDF paths, shuffle partitions sized to cores locally — on a real
1000-executor cluster AQE coalesces from a higher initial count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pulsar-es-sync-spark",
    cpus: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = driver-only: the driver heap IS executor memory.
        # 16g with 32 task threads GC-thrashes on 600k-row joins
        # (measured: 62s -> 3.6s on the 5-way star join when raised).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events fixture stores TIMESTAMP(NANOS); read as long and convert
        # explicitly (µs truncation — same as DuckDB's ns->µs cast).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # duplicate JSON keys are VALID JSON text; the reference's
        # serde_json keeps the last occurrence (insertion replaces).
        # Spark's default EXCEPTION policy instead kills the whole job
        # on the first such payload — one poison message halting a sync
        # service (found by the round-9 sf10 profile: a fixture bug
        # planted duplicate keys and the chain died mid-stage). LAST_WIN
        # is the reference-parity semantics.
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load fixture parquet tables as a dict of DataFrames (TESTDATA.md)."""
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
