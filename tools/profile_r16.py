"""Round-16 optimization profiler: per-lane isolation via the noop
sink (guide §1.4) + formatted-plan capture (guide §7.2) + per-lane
SPARK JOB COUNT (guide §1.1 — the round-15 core-count probe showed the
headline set is fixed-job-cost bound at sf0.1, so jobs-per-call is the
metric that predicts the driver's wall).

For each lane (default: bench.py's HEADLINE set) this runs ONE
untimed warm-up, then best-of-N timed noop-sink executions (computes
every column of every row, no count-prune), counts the Spark jobs one
``.count()`` run submits (status API job delta), and writes
``plans/r16/<lane>_<tag>.txt`` with the ``explain("formatted")``
output so before/after plan claims are checkable without Spark.

Usage:
    python tools/profile_r16.py [--tag before] [--reps 3] [lane ...]

Prints one JSON line:
    {"lanes": {name: {"noop_sec": s, "count_sec": s, "jobs": n}}}.
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


def _job_count(spark) -> int | None:
    """Completed-job count from the status REST API (None if off)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app_id = spark.sparkContext.applicationId
    try:
        raw = urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs", timeout=10
        ).read()
        return len(json.loads(raw))
    except Exception:
        return None


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
    spark = get_spark(
        app_name="profile_r16",
        cpus=cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
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
        # job count of exactly ONE bench-shaped run (.count())
        j0 = _job_count(spark)
        spark.sparkContext.setJobDescription(f"{name}: job-count run")
        fn(spark, sf_dir).count()
        j1 = _job_count(spark)
        jobs = (j1 - j0) if (j0 is not None and j1 is not None) else None
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
            "jobs": jobs,
            "noop_reps": [round(x, 3) for x in noops],
            "count_reps": [round(x, 3) for x in counts],
        }
        print(
            f"# {name}: noop best {out[name]['noop_sec']:.3f}s {out[name]['noop_reps']}"
            f" count best {out[name]['count_sec']:.3f}s jobs={jobs}",
            file=sys.stderr,
        )
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "lanes": out}))


if __name__ == "__main__":
    main()
