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
import re
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
    # production near-dup lanes (round 4): the paths you'd run at
    # 100 TB replace their exact/candidates-only twins here —
    # q_dedup_minhash → verified (candidates + exact-jaccard verify),
    # q_embed_neardup → IVF. The displaced twins stay oracle-checked.
    "q_dedup_minhash_verified",
    "q_corpus_curation",
    "q_text_stats",
    "q_token_count",
    "q_knn_cosine",
    "q_embed_neardup_ivf",
    # round-5 curation additions: one narrow shuffle-free scan
    # (repetition signals), one broadcast-join hygiene pass
    # (decontamination), one compressed-ANN lane (PQ ADC + re-rank)
    "q_repetition_filter",
    "q_decontaminate",
    "q_knn_pq",
    # the end-to-end curation composite: gate → decontaminate → dedup
    # → mix → split → pack in one plan
    "q_llm_pipeline",
    # late round-5 relational lanes: the no-equi-key interval join
    # (bucket-binning rewrite) and the one-pass two-grain rollup
    "q_range_join",
    "q_time_bucket_rollup",
    # round-7 heavy addition: applied substring dedup (Lee et al.
    # excision). The gram-matrix IVF semantic dedup lane is NOT here:
    # at fixture scale its wall is ~all fixed overhead (quantizer
    # training + the components iteration's checkpoint jobs), so a
    # headline entry would measure constants, not throughput — its
    # cost curve is pinned by the sf1→sf10 decade table (SCALE.md)
    # and tools/bench_decade.py instead.
    "q_substring_dedup",
    # round-10 additions: lexical retrieval (one skinny token shuffle +
    # broadcast sides) and the progressive-JPEG decode throughput (the
    # web's dominant image encoding through the pure-Python multi-scan
    # path — per-doc cost is the number that matters)
    "q_bm25_topk",
    "q_media_jpeg_prog",
    # round-12 addition: the per-epoch corpus permutation (range
    # exchange + offset pass — the operator every training run executes
    # once per epoch; its plan pin is the whole point: one Arrow node,
    # no single-partition window). q_kmeans_balance and
    # q_split_leakage_safe are NOT here for the same reason as the IVF
    # semantic dedup lane above: at fixture scale their walls are
    # iteration/checkpoint constants — their cost curves live in the
    # decade table (tools/probe_round12_decade.py, SCALE.md).
    "q_epoch_shuffle",
    # round-14 additions: the blendable-dataset interleave (ONE skinny
    # range exchange since the round-15 closed-form position rewrite,
    # pure JVM, no window) and the two-level block
    # epoch order (the per-epoch SKINNY metadata job that replaces a
    # full-corpus range exchange; its one window partitions by block —
    # bounded — and a global/single-partition window here would be the
    # regression the pin exists to catch is covered by arrow/window
    # counts below)
    "q_interleave_mix",
    "q_epoch_two_level",
    # round-15 addition: mixed-length bin packing (residual fill) —
    # one map-side-combined histogram agg + driver interval arithmetic
    # + broadcast range-joins; three fill rounds take padding waste
    # ~46 % below by-length at the same bin discipline.
    # q_loader_compose is NOT here: it composes the interleave +
    # two-level lanes already benched and its fixture-scale wall is
    # the scratch layout write (constants), not throughput.
    "q_pack_bins_mixed",
]

# per-query protocol: ONE untimed warm-up execution (pays plan codegen,
# first-shuffle setup, Python-worker spawn for that stage shape), then
# best-of-N timed reps — the steady-state figure, stable round-over-round
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


# Plan-shape pins (SF-independent invariants): wall time is host-noisy
# (the yardsticks prove 3-9× swings), so regressions like the round-4
# double Arrow evaluation of the minhash kernel are pinned on PLAN
# SHAPE instead — an extra ArrowEvalPython/MapInPandas node or a
# shuffle appearing in a pinned-shuffle-free lane fails the bench run
# loudly no matter what the clock says. Counts are max Python-crossing
# nodes in the executed plan (0 = pure JVM lane).
PLAN_PINS: dict[str, dict] = {
    "q_filter_regex": {"arrow_max": 0, "shuffle_free": True},
    "q_group_counts": {"arrow_max": 0},
    "q_rate_limit": {"arrow_max": 0},
    "q_etl_chain": {"arrow_max": 0},
    "q_tpch_pricing": {"arrow_max": 0},
    "q_tpch_join_topk": {"arrow_max": 0},
    "q_region_revenue": {"arrow_max": 0},
    "q_window_running": {"arrow_max": 0},
    "q_sessionize": {"arrow_max": 0},
    "q_asof_join": {"arrow_max": 0},
    "q_dedup_exact": {"arrow_max": 0},
    "q_corpus_curation": {"arrow_max": 0},
    "q_text_stats": {"arrow_max": 0},
    "q_token_count": {"arrow_max": 0},
    "q_repetition_filter": {"arrow_max": 0, "shuffle_free": True},
    "q_decontaminate": {"arrow_max": 0},
    "q_range_join": {"arrow_max": 0},
    "q_time_bucket_rollup": {"arrow_max": 0},
    # signature pass rides the candidates_from_bands checkpoint job
    # (one pass by construction); the visible node is the verify kernel
    "q_dedup_minhash_verified": {"arrow_max": 1},
    "q_knn_cosine": {"arrow_max": 1},
    "q_embed_neardup_ivf": {"arrow_max": 2},  # assign + within-cell cosine
    "q_knn_pq": {"arrow_max": 3},  # train/encode + probe ADC + re-rank
    "q_llm_pipeline": {"arrow_max": 1},  # at most the packing kernel (the gate stays expression-form — the Arrow twin lost the sf100 A/B, SCALE.md round 13)
    "q_substring_dedup": {"arrow_max": 0},  # md5 grams + windows, pure JVM
    "q_bm25_topk": {"arrow_max": 0},  # tokenize/agg/joins all JVM; the ≤5-element sum is an interpreted HOF, not Arrow
    "q_media_jpeg_prog": {"arrow_max": 2},  # synth corpus + decode: exactly two MapInPandas
    "q_epoch_shuffle": {"arrow_max": 0, "window_free": True},  # pure JVM (monotonic-id rank + broadcast offsets); a Window node here is the single-partition regression
    "q_interleave_mix": {"arrow_max": 0, "window_free": True},  # one global_index pass + closed-form positions — same no-window contract as q_epoch_shuffle
    "q_epoch_two_level": {"arrow_max": 0},  # one bounded per-block window is expected; no Arrow crossing anywhere
    "q_pack_bins_mixed": {"arrow_max": 0, "window_free": True},  # rank arithmetic end-to-end; a per-class window here is the mega-class skew regression
}

# Streaming state pins (round 8): the stateful lanes' peak state-store
# rows, bounded by what the operator SEMANTICS say may be live — a
# state blowup (e.g. a watermark that stops advancing, or per-event
# instead of per-key state) fails the bench like an Arrow-node
# regression does, long before it would OOM a real cluster. Bounds are
# computed from the input fixture at check time, so they scale with SF.
# Each bound is a callable (ev, n_out) -> max allowed peak state rows,
# where ev is the normalized batch view of the source events (raw
# fixture columns event_id/ts->pt/user_id/event_type/value/props; the
# lane topics derive topic_short == event_type) and n_out the lane's
# own output rows. Bounds are what the operator SEMANTICS admit:
STATE_PINS: dict[str, object] = {
    # ≤ one state row per distinct payload in the horizon — the lane
    # dedups the streamed `value`, which read_events_stream maps from
    # the fixture's `props` column (runner.py), NOT the fixture's
    # numeric `value`
    "dedup": lambda ev, n_out: ev.select("props").distinct().count(),
    # exactly one TAT state row per app key
    "gcra": lambda ev, n_out: ev.select("event_type").distinct().count(),
    # one state row per space-saving bucket (n_buckets=8 in the lane)
    "heavy_hitters": lambda ev, n_out: 8,
    # ≤ one window state row per (minute, topic_short) × is_debug
    "counters": lambda ev, n_out: 2
    * ev.selectExpr("date_trunc('minute', pt)", "event_type").distinct().count(),
    # merged session-window state: every session of the run may still
    # be live at peak (availableNow advances the watermark only at
    # batch ends), plus ≤ one in-progress unmerged window per user
    "sessionize": lambda ev, n_out: n_out
    + ev.select("user_id").distinct().count(),
    # symmetric join state ≤ both buffered sides in full
    "interval_join": lambda ev, n_out: ev.count(),
}


# Throughput floors (round 9, extended to ALL TEN stream lanes in
# round 10): catastrophic-regression detectors. Floors sit ~4–5×
# below the round-10 quiet-host steady state (SCALE.md round-10
# reference table) — NOT 3×, because the round-9 incident proved
# driver runs elevate up to 3.3× on host noise alone (r9 walls on
# byte-identical code: sessionize 7.38 s vs the quiet 2.57 s;
# re-measured round 10, adjudicated HOST — same-code quiet walls match
# r8's). A host burst stays above these floors; the regressions the
# pins exist for (index history re-shuffling per batch, quadratic
# candidate blowup, accidentally-eager per-branch re-execution, a
# state store gone per-event) cost integer multiples and land far
# below. Wall-noise-proof regressions stay the plan/state pins' job;
# these floors catch the class whose symptom is ONLY throughput.
# Calibrated at the driver's sf0.1 grain and enforced ONLY there: at
# smaller fixtures the fixed per-batch cost dominates a 10×-smaller
# batch, so the same healthy code legitimately reads far lower rates.
# Curation floors re-pinned for the round-10 configuration: 3
# micro-batches WITH compact_every=1 on the clock (the production
# shape; quiet steady state 744 / 211 docs/s).
THROUGHPUT_PINS: dict[str, int] = {
    "etl": 5_000,
    "sessionize": 9_000,
    "dedup": 9_000,
    "gcra": 12_000,
    "counters": 8_000,
    "interval_join": 3_000,
    "mview": 40_000,
    "heavy_hitters": 15_000,
    # curation lanes calibrated from the LOW end of the observed
    # quiet-host spread (404–744 / 152–211 docs/s across two
    # back-to-back runs — per-batch fixed costs swing ~1.8× even
    # quiet), then the same 3.3× host envelope as the other lanes:
    # 404/3.3 and 152/3.3, still far above what an integer-multiple
    # regression leaves
    "curation": 120,
    "curation_nd": 45,
    # round-12 lane: measured 8.9k msgs/s quiet (100k changes through
    # 4 partitioned splice merges); same ~4× host envelope
    "cdc": 2_000,
}
THROUGHPUT_PIN_SF = 0.1


ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "FlatMapGroupsInPandasWithState",
    "BatchEvalPython",  # row-at-a-time UDF: must never appear at all
)


def _shuffle_totals(spark) -> tuple[int, int] | None:
    """(read_bytes, write_bytes) summed over all completed stages, from
    the Spark status REST API (the UI is enabled for the bench session
    with a raised retainedStages so totals are monotone). Returns None
    — NOT zeros — when the API is unreachable: coercing to (0, 0)
    would make sh1-sh0 deltas nonsense AND let the shuffle_free pin
    pass vacuously, silently disabling the plan-shape gate."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        raw = urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ).read()
        stages = json.loads(raw)
    except Exception:
        return None
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


# Window EXEC node tokens, not the bare substring "Window" (round-12
# ADVICE: a column/table literally named "window..." or a time-window
# operator in a future pinned lane would trip a false violation):
# WindowExec prints as "Window [", plus the group-limit / running /
# pandas window variants
_WINDOW_NODE_RE = re.compile(
    r"Window\s*\[|WindowGroupLimit|RunningWindowFunction|WindowInPandas"
)


def _plan_profile(df) -> dict:
    """Executed-plan profile AFTER the action ran (AQE final plan):
    Python-crossing node count per kind + total."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {k: plan.count(k) for k in ARROW_NODES}
    # substring counting: every FlatMapGroupsInPandasWithState also
    # matches the FlatMapGroupsInPandas prefix — subtract so a stateful
    # node isn't double-counted into arrow_nodes
    counts["FlatMapGroupsInPandas"] -= counts["FlatMapGroupsInPandasWithState"]
    return {
        "arrow_nodes": sum(counts.values()),
        # for window_free pins: any window exec node — the
        # single-partition global-sort regression a total-ordering
        # lane must never plan
        "window_nodes": len(_WINDOW_NODE_RE.findall(plan)),
        **{k: v for k, v in counts.items() if v},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench",
        cpus=cpus,
        # status API on for the per-query shuffle-bytes profile; raised
        # stage retention keeps the cumulative totals monotone across
        # the ~2k stages a full bench run submits
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    qs = {**entrymod.queries(), **entrymod.extra_queries()}

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
    plans: dict[str, dict] = {}
    violations: list[str] = []
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).count()  # untimed warm-up rep
        reps = []
        sh0 = _shuffle_totals(spark)
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            reps.append(time.perf_counter() - t0)
        sh1 = _shuffle_totals(spark)
        timings[name] = round(min(reps), 3)
        prof = _plan_profile(df)
        # per-run shuffle bytes: identical across reps (deterministic
        # plan), so the rep-loop delta / REPS is one run's traffic.
        # An unreachable status API is a pin violation, not a zero:
        # every shuffle gate depends on it.
        if sh0 is None or sh1 is None:
            prof["shuffle_read_mb"] = prof["shuffle_write_mb"] = None
            if "status-api-unavailable" not in violations:
                violations.append("status-api-unavailable")
        else:
            prof["shuffle_read_mb"] = round((sh1[0] - sh0[0]) / REPS / 1e6, 3)
            prof["shuffle_write_mb"] = round((sh1[1] - sh0[1]) / REPS / 1e6, 3)
        plans[name] = prof
        pin = PLAN_PINS.get(name)
        if pin:
            if prof["arrow_nodes"] > pin.get("arrow_max", 10**9):
                violations.append(
                    f"{name}: {prof['arrow_nodes']} Python-crossing plan nodes"
                    f" > pinned max {pin['arrow_max']}"
                )
            # raw bytes, not the rounded MB figure — a few hundred
            # bytes of real shuffle per rep rounds to 0.000 MB and
            # would slip the pin. The timed reps go through .count(),
            # whose final aggregation is itself a tiny (~59 B) shuffle,
            # so the zero-shuffle check runs the bare plan once through
            # a noop write (no aggregation stage) and requires EXACTLY
            # zero bytes.
            if pin.get("window_free") and prof["window_nodes"] > 0:
                violations.append(
                    f"{name}: pinned window-free but the plan has"
                    f" {prof['window_nodes']} Window node(s)"
                )
            if pin.get("shuffle_free"):
                nz0 = _shuffle_totals(spark)
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                nz1 = _shuffle_totals(spark)
                if nz0 is None or nz1 is None:
                    if "status-api-unavailable" not in violations:
                        violations.append("status-api-unavailable")
                elif nz1[1] - nz0[1] > 0:
                    violations.append(
                        f"{name}: pinned shuffle-free but the bare plan wrote"
                        f" {nz1[1] - nz0[1]} shuffle bytes"
                    )
        if prof.get("BatchEvalPython"):
            violations.append(f"{name}: row-at-a-time Python UDF in the plan")
        print(
            f"# {name}: best {timings[name]:.3f}s of {[round(r, 3) for r in reps]} ({n} rows)"
            f" [arrow={prof['arrow_nodes']}"
            f" shuffle={prof['shuffle_read_mb']}/{prof['shuffle_write_mb']}MB]",
            file=sys.stderr,
        )

    stream = stream_throughput(spark, sf_dir, violations)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    report = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "plans": plans,
        "plan_violations": violations,
        "stream": stream,
        "yardsticks": yardsticks(spark),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # durable artifact: the driver's BENCH_rN.json keeps only a stdout
    # tail, which has truncated away per-query walls in past rounds —
    # persist the full report beside the repo so rounds can be diffed
    # mechanically, and keep the compact JSON as the LAST stdout line
    # so any tail capture still carries totals + per-query walls
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
        "w",
    ) as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(json.dumps(report))
    if violations:
        # fail LOUD after emitting the JSON record: a plan-shape
        # regression must never ride a green bench on a noisy host
        for v in violations:
            print(f"# PLAN PIN VIOLATED: {v}", file=sys.stderr)
        sys.exit(1)


def yardsticks(spark) -> dict:
    """Machine yardsticks (SCALE.md protocol, recorded per bench run so
    host drift is distinguishable from code regressions without a
    bisect): warm JVM codegen sum, warm 5M-row shuffle, numpy matmul,
    pure-Python loop. If the bench moves and these move proportionally
    it's the host; if the bench moves alone, bisect the code."""
    import time as _time

    import numpy as np

    r: dict[str, float] = {}
    spark.range(int(2e8)).selectExpr("sum(id)").collect()  # warm
    t0 = _time.perf_counter()
    spark.range(int(2e8)).selectExpr("sum(id)").collect()
    r["spark_range_2e8_sum_sec"] = round(_time.perf_counter() - t0, 3)
    sh = spark.range(int(5e6)).selectExpr("id", "id % 1000 as k")
    sh.groupBy("k").count().count()  # warm
    t0 = _time.perf_counter()
    sh.groupBy("k").count().count()
    r["spark_shuffle_5m_sec"] = round(_time.perf_counter() - t0, 3)
    a = np.random.default_rng(0).normal(size=(2000, 2000))
    _ = a @ a  # warm
    t0 = _time.perf_counter()
    for _i in range(3):
        _ = a @ a
    r["numpy_matmul_3x2000_sec"] = round(_time.perf_counter() - t0, 3)
    t0 = _time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    r["python_loop_10m_sec"] = round(_time.perf_counter() - t0, 3)
    return r


def _state_profile(q) -> dict:
    """Streaming-state profile of a finished query, from its progress
    history (the stateOperators block the status API exposes per
    micro-batch): peak state rows and memory across batches, plus the
    total rows dropped by watermark. This is the streaming twin of the
    batch plan profile — state growth is the streaming scale killer
    the wall clock can't see at fixture size."""
    rows_max = mem_max = dropped = 0
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        ops = p.get("stateOperators") or []
        rows_max = max(rows_max, sum(o.get("numRowsTotal", 0) for o in ops))
        mem_max = max(mem_max, sum(o.get("memoryUsedBytes", 0) for o in ops))
        dropped += sum(o.get("numRowsDroppedByWatermark", 0) for o in ops)
    return {
        "state_rows_max": rows_max,
        "state_mem_mb_max": round(mem_max / 1e6, 3),
        "rows_dropped_by_watermark": dropped,
    }


def stream_throughput(spark, sf_dir: str, violations: list[str] | None = None) -> dict:
    """STREAMING throughput series (3 lanes so streaming regressions
    are attributable, not one blended figure):

    - ``etl``: events → full ETL chain (filters, JSON parse, sanitize,
      timestamps, index rewrite, app extraction, debug classify) →
      partitioned bulk sink. The reference's own e2e is 1000 msgs →
      1000 docs with no latency figure (README.md:105-206); msgs/sec
      through the whole chain is the comparable single-node number.
      Its msgs/wall_sec/msgs_per_sec are ALSO exposed at the top level
      of the returned dict — the schema BENCH_r2/r3 recorded.
    - ``sessionize``: native session_window aggregation (30-min gap).
    - ``dedup``: content-hash dropDuplicatesWithinWatermark.
    - ``gcra``: exact per-app GCRA admission via
      applyInPandasWithState — the state-store round-trip (Arrow in,
      TAT state out) is the likeliest streaming regression surface.
    - ``counters``: G3 event-time windowed counters with watermark
      (streaming aggregation state).
    - ``interval_join``: stream-stream interval join (error windows ×
      signup events, both branches off the same source) — symmetric
      hash-join state keyed by time bucket.

    All lanes: file-source availableNow over the same events copy;
    msgs/s = INPUT events per wall second through the lane."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from pulsar_elasticsearch_sync_rs_spark.config import PipelineConfig
    from pulsar_elasticsearch_sync_rs_spark.streaming.runner import (
        read_events_stream,
        run_pipeline_stream,
    )
    from pulsar_elasticsearch_sync_rs_spark.streaming.sessions import sessionize_stream
    from pulsar_elasticsearch_sync_rs_spark.streaming.sink import ParquetBulkTransport
    from pulsar_elasticsearch_sync_rs_spark.streaming.stream_dedup import (
        dedup_stream_by_content,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src_dir = os.path.join(tmp, "src")
        os.makedirs(src_dir)
        ev_path = f"{sf_dir}/events.parquet"
        if os.path.isdir(ev_path):
            # multi-file fixture (tools/make_scale_decade.py output)
            for fname in os.listdir(ev_path):
                if fname.endswith(".parquet"):
                    shutil.copy(os.path.join(ev_path, fname), src_dir)
        else:
            shutil.copy(ev_path, src_dir)
        n_input = spark.read.parquet(src_dir).count()
        # normalized batch view of the source for the state-pin bounds
        # (nanos-long ts in the driver fixtures; real timestamps in the
        # decade fixtures)
        ev_norm = spark.read.parquet(src_dir)
        if dict(ev_norm.dtypes).get("ts") == "bigint":
            # integral `div`, NOT `/`: ns magnitudes exceed double's
            # 53-bit mantissa and float division rounds at the µs
            # level (same rule as sources/batch.py)
            ev_norm = ev_norm.withColumn(
                "pt", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            ev_norm = ev_norm.withColumn("pt", F.col("ts"))

        def run_lane(
            name: str, start_query, msgs_from_output: bool = False, count_output=None,
            n_input_override: int | None = None, pre=None,
        ) -> dict:
            # same protocol as the batch queries: ONE untimed warm-up
            # run (pays state-store init, sink codegen, Python-worker
            # spawn for the lane's stage shapes), then best-of-2 timed
            # runs — each run on fresh checkpoint/output dirs so
            # availableNow reprocesses the full input every time
            walls = []
            state = None
            last_finished = True
            for rep in range(3):
                ckpt = os.path.join(tmp, f"ckpt_{name}_{rep}")
                out = os.path.join(tmp, f"out_{name}_{rep}")
                if pre is not None:
                    # per-rep setup that must stay OFF the clock (e.g.
                    # the cdc lane's seed-snapshot copy)
                    pre(ckpt, out)
                t0 = _time.perf_counter()
                q = start_query(ckpt, out)
                finished = q.awaitTermination(300)
                if not finished:
                    # unchecked, a timed-out rep records a ~300 s wall
                    # while the query keeps running and races the next
                    # rep's reads — stop it and fail the bench loudly
                    q.stop()
                    if violations is not None:
                        violations.append(
                            f"stream/{name}: rep {rep} exceeded 300s and"
                            " was stopped (throughput figure invalid)"
                        )
                # a timed-out rep's ~300 s wall must NOT flow into the
                # reported msgs/s (round-12 ADVICE: the JSON would carry
                # a garbage figure readable apart from the violations
                # list) — only completed timed reps contribute
                if rep > 0 and finished:
                    walls.append(_time.perf_counter() - t0)
                last_finished = finished
                state = _state_profile(q)
            wall = min(walls) if walls else None
            # a stopped (timed-out) final rep leaves a PARTIAL sink —
            # counting it would feed msgs_from_output lanes a garbage
            # msgs/s that reads as valid beside the violation
            # (round-13 review finding)
            last_out = os.path.join(tmp, f"out_{name}_2")
            n_out = (
                (
                    count_output(last_out)
                    if count_output
                    else spark.read.parquet(last_out).count()
                )
                if last_finished
                else None
            )
            # the ETL lane counts OUTPUT rows (the exact metric BENCH_r2/
            # r3 recorded — identical to input only while nothing dead-
            # letters); aggregating lanes report input msgs/s since their
            # output grain differs (sessions, deduped rows)
            n_msgs = n_out if msgs_from_output else (
                n_input if n_input_override is None else n_input_override
            )
            rate = (
                None
                if wall is None or n_msgs is None
                else round(n_msgs / wall)
            )
            print(
                f"# stream/{name}: {n_msgs} msgs in"
                f" {'TIMEOUT' if wall is None else f'{wall:.3f}s'} = {rate} msgs/s"
                f" best of {[round(w, 3) for w in walls]} ({n_out} output rows)"
                f" [state_rows={state['state_rows_max']}"
                f" state_mem={state['state_mem_mb_max']}MB"
                f" wm_dropped={state['rows_dropped_by_watermark']}]",
                file=sys.stderr,
            )
            lane = {
                "msgs": n_msgs,
                "wall_sec": None if wall is None else round(wall, 3),
                "msgs_per_sec": rate,
            }
            if state["state_rows_max"] or state["state_mem_mb_max"]:
                lane["state"] = state
            bound = STATE_PINS.get(name)
            if bound is not None and violations is not None and n_out is not None:
                limit = bound(ev_norm, n_out)
                if state["state_rows_max"] > limit:
                    violations.append(
                        f"stream/{name}: peak state {state['state_rows_max']} rows"
                        f" > pinned bound {limit}"
                    )
            sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
            at_pinned_sf = sf_tag == str(THROUGHPUT_PIN_SF)
            floor = THROUGHPUT_PINS.get(name) if at_pinned_sf else None
            if (
                floor is not None
                and violations is not None
                and rate is not None
                and rate < floor
            ):
                violations.append(
                    f"stream/{name}: {rate} msgs/s below the catastrophic"
                    f"-regression floor {floor} (quiet-host steady state per"
                    " lane is in SCALE.md's round-10 reference table; floors"
                    " sit 3.3-5x below it — see THROUGHPUT_PINS)"
                )
            return lane

        def start_etl(ckpt, out):
            return run_pipeline_stream(
                spark,
                PipelineConfig(),
                read_events_stream(spark, src_dir),
                ParquetBulkTransport(out),
                ckpt,
                available_now=True,
                observe_metrics=False,
            )

        def start_sessionize(ckpt, out):
            src = read_events_stream(spark, src_dir)
            sessions = sessionize_stream(
                src.select("user_id", F.col("publish_time").alias("ts")),
                watermark_delay="1 minute",
            )
            return (
                sessions.writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .format("parquet")
                .option("path", out)
                .start()
            )

        def start_dedup(ckpt, out):
            src = read_events_stream(spark, src_dir)
            deduped = dedup_stream_by_content(src, text_col="value")
            return (
                deduped.writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .format("parquet")
                .option("path", out)
                .start()
            )

        # hoisted OUT of start_gcra: this batch scan+collect is
        # identical across reps and would otherwise run inside the
        # timed window, charging the gcra lane a constant batch cost
        # the other lanes don't pay
        apps = [
            r["app"]
            for r in spark.read.parquet(src_dir)
            .select(F.col("event_type").alias("app"))
            .distinct()
            .collect()
        ]

        def start_gcra(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.rate_limit_state import (
                rate_limit_stream_gcra,
            )

            src = read_events_stream(spark, src_dir)
            ev = src.select(
                "event_id",
                F.element_at(F.split("topic", "/"), -1).alias("app"),
                F.col("publish_time").alias("ts"),
            )
            return (
                rate_limit_stream_gcra(ev, {a: 50 for a in apps})
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .format("parquet")
                .option("path", out)
                .start()
            )

        def start_counters(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.functions.debug import is_debug_log
            from pulsar_elasticsearch_sync_rs_spark.streaming.counters import (
                windowed_counters,
            )

            cfg = PipelineConfig()
            src = read_events_stream(spark, src_dir)
            enriched = src.withColumn(
                "topic_short", F.element_at(F.split("topic", "/"), -1)
            ).withColumn("is_debug", is_debug_log("value", cfg.debug_log_pattern))
            return (
                windowed_counters(
                    enriched, window_duration="1 minute", watermark_delay="2 minutes"
                )
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .format("parquet")
                .option("path", out)
                .start()
            )

        def start_ijoin(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.interval_join import (
                stream_interval_join,
            )

            src = read_events_stream(spark, src_dir)
            base = src.select(
                "event_id",
                F.element_at(F.split("topic", "/"), -1).alias("app"),
                F.col("publish_time").alias("ts"),
            )
            ivs = base.filter(F.col("app") == "error").select(
                F.col("event_id").alias("error_id"), F.col("ts").alias("w_start")
            )
            pts = base.filter(F.col("app") == "signup").select(
                F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
            )
            paired = stream_interval_join(
                pts, ivs, "s_ts", "w_start", 1800, watermark_delay="1 minute"
            )
            return (
                paired.select("error_id", "signup_id")
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .format("parquet")
                .option("path", out)
                .start()
            )

        def start_mview(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.mview import (
                maintain_count_sum_view,
            )

            src = read_events_stream(spark, src_dir)
            ev = src.select(
                F.element_at(F.split("topic", "/"), -1).alias("app"),
                F.length("value").cast("double").alias("v"),
            )
            return maintain_count_sum_view(ev, ["app"], "v", out, ckpt, available_now=True)

        def mview_outputs(out_dir):
            from pulsar_elasticsearch_sync_rs_spark.streaming.mview import read_view

            view = read_view(spark, out_dir)
            return 0 if view is None else view.count()

        def start_hh(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.heavy_hitters import (
                heavy_hitters_stream,
            )

            src = read_events_stream(spark, src_dir)
            toks = src.select(
                F.explode(
                    F.split(F.lower(F.col("value")), r'[\s",:{}]+')
                ).alias("token")
            ).filter(F.col("token") != "")

            def sink(batch_df, batch_id):
                batch_df.write.mode("append").parquet(out)

            return (
                heavy_hitters_stream(toks, n_buckets=8, capacity=32)
                .writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        # curation ingestion lane: documents (not events) through the
        # end-to-end foreachBatch curation job — gate → decontam →
        # within-batch + accumulated-index dedup → parquet land. 6 input
        # files / maxFilesPerTrigger=2 → 3 micro-batches, so the
        # cross-batch sha-index anti-join path is on the clock — AND,
        # round 10, so is compaction: compact_every=1 is the production
        # configuration (bounded partition count), which puts the
        # amortized fold cost (one shuffle of the skinny index per
        # fold) inside the measured wall instead of only in an e2e
        # test. Post-run, the index directories must show the bounded
        # partition count (assertion below) — the bound and the cost
        # are both continuously measured.
        CUR_COMPACT_EVERY = 1
        CUR_RETAIN = 1  # compact_index_batches default the hook uses
        docs_src = os.path.join(tmp, "docs_src")
        (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(6)
            .write.parquet(docs_src)
        )
        n_docs = spark.read.parquet(docs_src).count()
        docs_schema = spark.read.parquet(docs_src).schema

        # CDC lane inputs: the events become a change log (unique
        # (k, ts) by construction — event_id is unique), 4 part files =
        # 4 micro-batches; the seed snapshot (half the key domain open)
        # is written ONCE and copytree'd per rep so seeding cost stays
        # off the ingestion clock
        cdc_src = os.path.join(tmp, "cdc_src")
        (
            ev_norm.select(
                F.col("event_id").alias("k"),
                F.col("value").cast("double").alias("v"),
                F.when(F.col("event_id") % 10 < 7, F.lit("I"))
                .when(F.col("event_id") % 10 < 9, F.lit("U"))
                .otherwise(F.lit("D"))
                .alias("op"),
                F.col("pt").alias("ts"),
            )
            .repartition(4)
            .write.parquet(cdc_src)
        )
        n_cdc = spark.read.parquet(cdc_src).count()
        cdc_seed_dir = os.path.join(tmp, "cdc_seed")
        from pulsar_elasticsearch_sync_rs_spark.operators.cdc import (
            persist_scd2_partitioned,
        )

        persist_scd2_partitioned(
            spark.read.parquet(cdc_src)
            .filter(F.col("k") % 2 == 0)
            .select(
                "k",
                "v",
                F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"),
            ),
            cdc_seed_dir,
            key="k",
            n_parts=16,
        )

        def pre_cdc(ckpt, out):
            shutil.copytree(cdc_seed_dir, out)

        def start_cdc(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.cdc_ingest import (
                run_cdc_ingest,
            )

            stream = (
                spark.readStream.schema("k long, v double, op string, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(cdc_src)
            )
            return run_cdc_ingest(
                stream,
                out,
                ckpt,
                key="k",
                attrs=["v"],
                n_parts=16,
                available_now=True,
            )

        def start_curation(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.curation import (
                run_curation_ingest,
            )

            stream = (
                spark.readStream.schema(docs_schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(docs_src)
            )
            bench_docs = spark.read.parquet(docs_src).filter(
                F.col("doc_id") % 97 == 0
            )
            return run_curation_ingest(
                stream,
                bench_docs,
                out,
                f"{ckpt}_sha",
                ckpt,
                n=5,
                available_now=True,
                compact_every=CUR_COMPACT_EVERY,
            )

        def start_curation_nd(ckpt, out):
            from pulsar_elasticsearch_sync_rs_spark.streaming.curation import (
                run_curation_ingest,
            )

            stream = (
                spark.readStream.schema(docs_schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(docs_src)
            )
            bench_docs = spark.read.parquet(docs_src).filter(
                F.col("doc_id") % 97 == 0
            )
            return run_curation_ingest(
                stream,
                bench_docs,
                out,
                f"{ckpt}_sha",
                ckpt,
                n=5,
                available_now=True,
                near_dup_threshold=0.5,
                bands_dir=f"{ckpt}_bands",
                compact_every=CUR_COMPACT_EVERY,
            )

        def check_index_bound(lane: str, index_dir: str, report: dict) -> None:
            """Post-run partition-count assertion for an accumulated
            index directory: with compaction on the clock the count must
            stay ≤ 1 (consolidated generation) + retain + batches since
            the last fold (< compact_every) — unbounded growth here is
            exactly the regression compaction exists to kill."""
            if not os.path.isdir(index_dir):
                if violations is not None:
                    violations.append(f"stream/{lane}: index dir {index_dir} missing")
                return
            parts = [e for e in os.listdir(index_dir) if e.startswith("batch=")]
            # post-run, slices since the LAST fold number < compact_every
            # (bound must sit below the no-compaction partition count at
            # this very configuration, or the check is vacuous)
            bound = 1 + CUR_RETAIN + (CUR_COMPACT_EVERY - 1)
            report[f"{lane.split('/')[-1]}_index_partitions"] = len(parts)
            if violations is not None and len(parts) > bound:
                violations.append(
                    f"stream/{lane}: {len(parts)} index partitions after the"
                    f" run > bound {bound} (compaction not holding)"
                )

        etl = run_lane("etl", start_etl, msgs_from_output=True)
        out = {
            **etl,  # BENCH_r2/r3-compatible top-level ETL figures
            "sessionize": run_lane("sessionize", start_sessionize),
            "dedup": run_lane("dedup", start_dedup),
            "gcra": run_lane("gcra", start_gcra),
            "counters": run_lane("counters", start_counters),
            "interval_join": run_lane("interval_join", start_ijoin),
            "mview": run_lane("mview", start_mview, count_output=mview_outputs),
            "heavy_hitters": run_lane("heavy_hitters", start_hh),
            "curation": run_lane(
                "curation", start_curation, n_input_override=n_docs
            ),
            # 10th lane: the curation topology with the near-dup stage
            # on — per batch: signature pass, within-batch + accumulated
            # band-index candidates, exact-jaccard verify, band-slice
            # land. Docs/s at the FULL dedup-on-arrival grain.
            "curation_nd": run_lane(
                "curation_nd", start_curation_nd, n_input_override=n_docs
            ),
            # CDC → SCD2 continuous merge: change events per wall
            # second through the partitioned splice (streaming/
            # cdc_ingest.py); output rows = final snapshot versions
            "cdc": run_lane("cdc", start_cdc, n_input_override=n_cdc, pre=pre_cdc),
        }
        # compaction's whole point, checked from the directories the
        # run leaves behind (last rep's checkpoints):
        check_index_bound(
            "curation/sha", os.path.join(tmp, "ckpt_curation_2_sha"), out["curation"]
        )
        check_index_bound(
            "curation_nd/sha",
            os.path.join(tmp, "ckpt_curation_nd_2_sha"),
            out["curation_nd"],
        )
        check_index_bound(
            "curation_nd/bands",
            os.path.join(tmp, "ckpt_curation_nd_2_bands"),
            out["curation_nd"],
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
