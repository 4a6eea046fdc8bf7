"""Round-14 sf100 A/B: the FIFTH q_llm_pipeline gate shape the
round-13 A/B skipped (VERDICT r13, item 1) — a SKINNY gate-decision
checkpoint (survivor doc_ids only, ~8 B/doc) + broadcast LEFT SEMI —
against the shipped expression form (the 208.9 s record).

Protocol (SCALE.md, identical to the round-13 A/B): one untimed
warm-up + 1 timed rep per shape, noop write action (materializes every
output column), numpy-matmul yardstick bracketing each timed rep so
host drift is adjudicable. Shapes toggled via
SPARK_GRAFT_PIPELINE_GATE (read per-call inside q_llm_pipeline).

Run:  python tools/probe_gate_semi.py [FIXTURE_DIR] [SHAPES]
      (defaults: /tmp/sf100 expr,semi)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pulsar_elasticsearch_sync_rs_spark.plans.llm_queries import q_llm_pipeline
from pulsar_elasticsearch_sync_rs_spark.session import get_spark


def matmul_yardstick() -> float:
    a = np.random.default_rng(0).normal(size=(2000, 2000))
    _ = a @ a  # warm
    t0 = time.perf_counter()
    for _i in range(3):
        _ = a @ a
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    shapes = (sys.argv[2] if len(sys.argv) > 2 else "expr,semi").split(",")
    spark = get_spark(
        app_name="probe_gate_semi",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    out: dict[str, dict] = {}
    for shape in shapes:
        os.environ["SPARK_GRAFT_PIPELINE_GATE"] = shape
        # warm-up (untimed): warms page cache + JVM codegen for this shape
        q_llm_pipeline(spark, fixture).write.format("noop").mode(
            "overwrite"
        ).save()
        y0 = matmul_yardstick()
        t0 = time.perf_counter()
        q_llm_pipeline(spark, fixture).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 1)
        y1 = matmul_yardstick()
        out[shape] = {"wall_sec": wall, "matmul_before": y0, "matmul_after": y1}
        print(f"SHAPE {shape}: {wall} s  (matmul {y0}/{y1})", flush=True)
    print(json.dumps({"fixture": fixture, "shapes": out}))


if __name__ == "__main__":
    main()
