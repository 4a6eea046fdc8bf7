"""Round-15 optimization profiler: per-lane isolation via the noop
sink (guide §1.4) + formatted-plan capture (guide §7.2).

For each lane (default: bench.py's HEADLINE set) this runs ONE
untimed warm-up, then best-of-N timed noop-sink executions (computes
every column of every row, no count-prune), and writes
``plans/r15/<lane>_<tag>.txt`` with the ``explain("formatted")``
output so before/after plan claims are checkable without Spark.

Usage:
    python tools/profile_r15.py [--tag before] [--reps 3] [lane ...]

Prints one JSON line: {"lanes": {name: {"noop_sec": s, "count_sec": s}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pulsar_elasticsearch_sync_rs_spark.session import get_spark

import bench as benchmod


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    reps = 3
    lanes: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            lanes.append(args[i])
            i += 1
    if not lanes:
        lanes = list(benchmod.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_r15", cpus=cpus)
    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(plan_dir, exist_ok=True)

    # same warm-up as bench.py: footer cache + Arrow worker spawn
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from pyspark.sql import functions as F

    from pulsar_elasticsearch_sync_rs_spark.operators.similarity import cosine_udf

    (
        spark.range(256)
        .select(F.array(F.rand(1), F.rand(2)).alias("a"))
        .select(cosine_udf("a", "a").alias("c"))
        .count()
    )

    out: dict[str, dict] = {}
    for name in lanes:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, sf_dir).count()
        noops, counts = [], []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: noop rep {r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            noops.append(time.perf_counter() - t0)
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: count rep {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            counts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        # formatted plan of a fresh build (pre-execution, AQE initial)
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        out[name] = {
            "noop_sec": round(min(noops), 3),
            "count_sec": round(min(counts), 3),
            "noop_reps": [round(x, 3) for x in noops],
            "count_reps": [round(x, 3) for x in counts],
        }
        print(
            f"# {name}: noop best {out[name]['noop_sec']:.3f}s {out[name]['noop_reps']}"
            f" count best {out[name]['count_sec']:.3f}s",
            file=sys.stderr,
        )
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "lanes": out}))


if __name__ == "__main__":
    main()
