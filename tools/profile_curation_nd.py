"""Per-stage wall profile of the curation_nd streaming lane (round-13
VERDICT item 4: the slowest stream lane, 258 docs/s vs curation's 958).
Mirrors bench.py's start_curation_nd topology exactly (6 input files,
maxFilesPerTrigger=2 → 3 micro-batches, compact_every=1) and prints the
driver-measured stage walls run_curation_ingest's new ``stage_timings``
hook records — signature / counters / corpus_write / sha_slice /
band_slice / compact per batch.

Run:  python tools/profile_curation_nd.py [SF_DIR] [--nd|--plain]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.session import get_spark
from pulsar_elasticsearch_sync_rs_spark.streaming.curation import (
    run_curation_ingest,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nd = "--plain" not in sys.argv
    spark = get_spark(
        app_name="profile_curation_nd",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    tmp = tempfile.mkdtemp(prefix="cur_nd_prof_")
    docs_src = os.path.join(tmp, "docs_src")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(6)
        .write.parquet(docs_src)
    )
    n_docs = spark.read.parquet(docs_src).count()
    docs_schema = spark.read.parquet(docs_src).schema
    bench_docs = spark.read.parquet(docs_src).filter(F.col("doc_id") % 97 == 0)

    timings: list = []
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(docs_src)
    )
    ckpt = os.path.join(tmp, "ckpt")
    kwargs = dict(
        n=5,
        available_now=True,
        compact_every=1,
        stage_timings=timings,
    )
    if nd:
        kwargs.update(
            near_dup_threshold=0.5,
            bands_dir=os.path.join(tmp, "bands"),
        )
    t0 = time.perf_counter()
    q = run_curation_ingest(
        stream,
        bench_docs,
        os.path.join(tmp, "out"),
        os.path.join(tmp, "sha"),
        ckpt,
        **kwargs,
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    print(f"total {wall:.1f} s  {n_docs / wall:.0f} docs/s  ({n_docs} docs)")
    agg: dict[str, float] = {}
    for t in timings:
        print(json.dumps(t))
        for k, v in t.items():
            if k != "batch_id":
                agg[k] = round(agg.get(k, 0.0) + v, 3)
    batch_total = agg.pop("batch_total", 0.0)
    print("TOTALS", json.dumps(agg), f"batch_total={batch_total}")
    print(
        "in-batch untimed",
        round(batch_total - sum(agg.values()), 1),
        "s; stream machinery",
        round(wall - batch_total, 1),
        "s (trigger planning, offset/commit logs, listing)",
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
