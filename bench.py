"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed as a count()/collect-free action (count of the
result) after a warm-up of the session. Wall time per query includes
planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pulsar_elasticsearch_sync_rs_spark.session import get_spark

# headline set: the reference-parity flagship + representative heavy
# queries from each pack (join, window, dedup, similarity, text)
HEADLINE = [
    "q_filter_regex",
    "q_group_counts",
    "q_rate_limit",
    "q_etl_chain",
    "q_tpch_pricing",
    "q_tpch_join_topk",
    "q_region_revenue",
    "q_window_running",
    "q_sessionize",
    "q_asof_join",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_corpus_curation",
    "q_text_stats",
    "q_token_count",
    "q_knn_cosine",
    "q_embed_neardup",
]

# per-query protocol: ONE untimed warm-up execution (pays plan codegen,
# first-shuffle setup, Python-worker spawn for that stage shape), then
# best-of-N timed reps — the steady-state figure, stable round-over-round
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench", cpus=cpus)
    qs = entrymod.queries()

    # warm up the JVM, parquet footer cache, and the Python/Arrow UDF
    # workers (first pandas-UDF call pays worker spawn + numpy import —
    # steady-state throughput is what we measure)
    # touch every input table once: the fixtures are single-row-group
    # parquet files, so the first scan is single-task cold IO — warm the
    # page cache and measure steady-state compute
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from pulsar_elasticsearch_sync_rs_spark.operators.similarity import cosine_udf
    from pyspark.sql import functions as F

    (
        spark.range(256)
        .select(F.array(F.rand(1), F.rand(2)).alias("a"))
        .select(cosine_udf("a", "a").alias("c"))
        .count()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).count()  # untimed warm-up rep
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        print(
            f"# {name}: best {timings[name]:.3f}s of {[round(r, 3) for r in reps]} ({n} rows)",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
