"""Skew-guard TRIGGER tests — the adversarial distributions the guard
paths were built for (zipfian hot keys, boilerplate clone clusters;
see tools/make_skew_fixture.py, which sweeps the full oracle registry
on the same shapes). The uniform driver fixtures never fire these
paths, so green results there only prove the guards don't BREAK
answers; these tests prove the guards actually ENGAGE — asserted on
row counters and plan shape, not just final results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BOILER = (
    "breaking news subscribe to our newsletter for the latest updates "
    "terms of service apply all rights reserved contact us for details "
    "cookie policy privacy statement follow us on every platform now"
)


@pytest.fixture(scope="module")
def clone_docs(spark, sf_dir):
    """sf0.001 documents with every 3rd doc's text replaced by ONE
    shared boilerplate passage — the crawl pathology that floods a
    minhash band bucket (a ~167-doc identical cluster)."""
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.lit(BOILER)).otherwise(F.col("text")),
    ).persist()
    cluster = sorted(
        r["doc_id"] for r in out.filter(F.col("text") == BOILER).collect()
    )
    yield out, cluster
    out.unpersist()


def test_mega_bucket_star_guard_engages_on_clone_cluster(spark, clone_docs):
    """With the clone cluster larger than max_bucket, every one of its
    band buckets must take the STAR path: exactly (k-1) hub→member
    pairs for the cluster instead of the k(k-1)/2 all-pairs expansion
    — the O(k²)→O(k) row counter IS the guard's engagement proof —
    while transitive connectivity (what downstream cluster dedup
    consumes) is fully preserved."""
    from pulsar_elasticsearch_sync_rs_spark.operators.components import (
        connected_components,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        minhash_candidates,
    )

    docs, cluster = clone_docs
    k = len(cluster)
    assert k > 100  # the fixture shape this test exists for

    guarded = minhash_candidates(docs, max_bucket=50).persist()
    in_cluster = set(cluster)
    cpairs = [
        (r["id_a"], r["id_b"])
        for r in guarded.collect()
        if r["id_a"] in in_cluster and r["id_b"] in in_cluster
    ]
    hub = cluster[0]
    # star shape: one spoke per non-hub member, nothing spoke-to-spoke
    assert len(cpairs) == k - 1
    assert all(a == hub for a, _ in cpairs)
    assert {b for _, b in cpairs} == in_cluster - {hub}

    # guard OFF (cap above k): the same cluster explodes all-pairs —
    # the quadratic row count the guard exists to prevent
    unguarded = minhash_candidates(docs, max_bucket=10**6)
    n_unguarded = (
        unguarded.filter(
            F.col("id_a").isin(cluster) & F.col("id_b").isin(cluster)
        ).count()
    )
    assert n_unguarded == k * (k - 1) // 2
    assert len(cpairs) < n_unguarded / 50  # O(k) vs O(k²), concretely

    # connectivity preserved: the star pairs still yield ONE component
    # containing the whole cluster
    comp = connected_components(guarded)
    labels = {
        r["component"]
        for r in comp.filter(F.col("id").isin(cluster)).collect()
    }
    assert labels == {hub}
    guarded.unpersist()


@pytest.fixture(scope="module")
def zipf_events(spark, sf_dir):
    """sf0.001 events with a hot user owning ~40% of all rows
    (deterministic remap — the zipf head make_skew_fixture.py draws)."""
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    hot = F.pmod(F.col("event_id") * 2654435761, F.lit(100)) < 40
    out = ev.withColumn(
        "user_id", F.when(hot, F.lit(7)).otherwise(F.col("user_id"))
    ).persist()
    yield out
    out.unpersist()


def test_salted_agg_spreads_hot_key_and_matches_direct(spark, zipf_events):
    """Under a 40%-hot key, the salted aggregation must (a) return the
    direct groupBy's exact answer and (b) actually SPREAD the hot key:
    its pre-aggregate grain carries all n_salts partials for the hot
    key, and the executed plan shows the extra (key, salt) exchange
    stage the spread rides on."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import (
        _salt_expr,
        salted_count,
    )

    ev = zipf_events
    n_salts = 8
    res = salted_count(ev, "user_id", "event_id", n_salts=n_salts)
    direct = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = {r["user_id"]: r["n_records"] for r in res.collect()}
    assert got == direct
    n_hot = direct[7]
    assert n_hot >= 0.3 * sum(direct.values())  # the skew is real

    # trigger proof 1 (row counter): the operator's own salt expression
    # fans the hot key's rows across ALL n_salts partial groups — the
    # single pinned reducer becomes n_salts reducers
    spread = (
        ev.filter(F.col("user_id") == 7)
        .select(_salt_expr("event_id", n_salts).alias("s"))
        .distinct()
        .count()
    )
    assert spread == n_salts

    # trigger proof 2 (plan shape): two aggregation exchanges — the
    # first hash-partitioned on (user_id, __salt), the final on user_id
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert plan.count("hashpartitioning(user_id") >= 2


def test_salted_join_joins_on_salted_key_under_skew(spark, zipf_events):
    """salted_join under the zipf fact side: result set identical to
    the plain join, and the physical join key includes the salt (the
    hot key's rows land on n_salts join partitions, the dim row riding
    replicated) — asserted on the executed plan, not just output."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import salted_join

    fact = zipf_events
    dim = (
        fact.select("user_id")
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 5))
    )
    joined = salted_join(fact, dim, "user_id", salt_from="event_id", n_salts=8)
    direct = fact.join(dim, "user_id")
    assert joined.count() == direct.count()
    got = {
        (r["event_id"], r["segment"])
        for r in joined.select("event_id", "segment").collect()
    }
    want = {
        (r["event_id"], r["segment"])
        for r in direct.select("event_id", "segment").collect()
    }
    assert got == want

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "join did not execute on the salted key"


def test_ivf_max_cell_guard_bounds_groups_and_keeps_clusters(spark, sf_dir):
    """semantic_dedup_ivf's oversized-cell guard (max_cell): a
    degenerate embedding distribution (one identical mega-cluster that
    k-means cannot split, under an explicit tiny nlist) must be salted
    into ~max_cell-row shards with the hub replicated into each —
    ENGAGEMENT asserted on the kernel's group sizes (the per-task
    memory bound the guard exists for), and the survivor set must
    still collapse the whole cluster to its min id (hub replication
    preserves connectivity across shards)."""
    import numpy as np
    import pandas as pd

    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        semantic_dedup_ivf,
    )
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.first()["embedding"])
    n = emb.count()
    # every 2nd vector becomes ONE shared direction -> a ~n/2 identical
    # cluster; nlist=2 (explicit, tiny) concentrates it in one cell,
    # far above max_cell=64
    shared = [float(i % 7 - 3) or 1.0 for i in range(dim)]
    degenerate = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 2 == 0,
            F.array(*[F.lit(v) for v in shared]),
        ).otherwise(F.col("embedding")),
    )
    cluster = sorted(
        r["vec_id"] for r in degenerate.filter(F.col("vec_id") % 2 == 0).collect()
    )
    assert len(cluster) > 64

    out = semantic_dedup_ivf(
        degenerate, threshold=0.99, nlist=2, nprobe=1, max_cell=64
    ).collect()
    by_id = {r["vec_id"]: r["cluster_size"] for r in out}
    # the whole identical cluster collapsed to its min id, exact size
    assert by_id.get(cluster[0]) == len(cluster), (
        f"hub stitching failed: {by_id.get(cluster[0])} != {len(cluster)}"
    )
    assert not any(i in by_id for i in cluster[1:]), "cluster member survived"
    # parity on the same input with the guard OFF (small data: the
    # unguarded kernel can still hold the cell) - identical survivors
    base = {
        (r["vec_id"], r["cluster_size"])
        for r in semantic_dedup_ivf(
            degenerate, threshold=0.99, nlist=2, nprobe=1
        ).collect()
    }
    assert {(r["vec_id"], r["cluster_size"]) for r in out} == base

    # ENGAGEMENT: replicate the guard's routing and measure what group
    # sizes actually reach a task - bounded by ~max_cell (hash salting
    # is an expected bound; allow 2x slack), vs the unguarded mega cell
    from pulsar_elasticsearch_sync_rs_spark.operators.ivf import (
        make_cell_probe_udf,
        train_coarse_quantizer,
    )

    centers = train_coarse_quantizer(
        degenerate, id_col="vec_id", vec_col="embedding", nlist=2, seed=42
    )
    probe = make_cell_probe_udf(centers, nprobe=1)
    cells = degenerate.select(
        "vec_id", F.explode(probe(F.col("embedding"))).alias("cell_id")
    )
    sizes = cells.groupBy("cell_id").agg(F.count("*").alias("k"))
    kmax = sizes.agg(F.max("k")).first()[0]
    assert kmax > 64, "fixture failed to produce a mega cell"
    nsh = -(-kmax // 64)
    sharded = (
        cells.withColumn("s", F.pmod(F.xxhash64("vec_id"), F.lit(nsh)))
        .groupBy("cell_id", "s")
        .agg(F.count("*").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert sharded <= 2 * 64, f"shard of {sharded} rows exceeds the bound"


def _node_order(df, *tokens):
    """Top-down token sequence of the executed plan — the same probe
    the round-15 pushdown investigation used."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints the final plan FOLLOWED by
    # the original under "== Initial Plan ==" — count the final only
    plan = plan.split("== Initial Plan ==")[0]
    order = []
    for line in plan.split("\n"):
        s = line.strip(" :+-*(0123456789)")
        for tok in tokens:
            if s.startswith(tok):
                order.append(tok)
                break
    return order


def test_no_pushdown_pins_filter_above_exchange_and_is_value_identical(spark):
    """no_pushdown (operators/skew.py): Catalyst pushes deterministic
    filters below a repartition (splitting conjunctions), which lands
    an expensive gate on the pre-spread single-task scan; the wrapper
    must (a) keep the filter ABOVE the exchange and (b) change no
    values — including NULL predicates dropping the row exactly like a
    bare filter."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import no_pushdown

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 0), (4, 9)], "id long, x int"
    ).localCheckpoint(eager=True)
    pred = F.col("x") > 0  # NULL x -> NULL pred -> row dropped

    plain = df.repartition(4, "id").filter(pred)
    wrapped = df.repartition(4, "id").filter(no_pushdown(pred))

    # value identity, NULL handling included
    assert sorted(r["id"] for r in plain.collect()) == [1, 4]
    assert sorted(r["id"] for r in wrapped.collect()) == [1, 4]

    # placement: plain pushes below the exchange, wrapped stays above
    assert _node_order(plain, "Exchange", "Filter") == ["Exchange", "Filter"]
    assert _node_order(wrapped, "Exchange", "Filter") == ["Filter", "Exchange"]


def test_no_pushdown_keeps_arrow_gate_above_exchange(spark):
    """The streaming-curation shape (optimization round 15): an Arrow
    gate kernel referenced by a filter must evaluate on the SPREAD side
    of the exchange — pushed below it, the kernel runs on the
    micro-batch's raw one-partition-per-file split, serializing the
    text crossing spread_scan exists to parallelize."""
    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        text_signals_fast,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import no_pushdown

    df = spark.createDataFrame(
        [(i, "some sample words here " * 3) for i in range(8)],
        "doc_id long, text string",
    ).localCheckpoint(eager=True)
    sig = text_signals_fast("text")
    gate = sig["quality"] >= 0.0  # tautology; placement is the test

    plain = df.repartition(4, "doc_id").filter(gate)
    wrapped = df.repartition(4, "doc_id").filter(no_pushdown(gate))

    assert _node_order(plain, "Exchange", "ArrowEvalPython") == [
        "Exchange",
        "ArrowEvalPython",
    ]
    assert _node_order(wrapped, "Exchange", "ArrowEvalPython") == [
        "ArrowEvalPython",
        "Exchange",
    ]
    assert plain.count() == wrapped.count() == 8


def test_evaluate_once_pins_single_evaluation_and_is_value_identical(spark):
    """evaluate_once (operators/skew.py): a filter on a projected
    expensive column is pushed back through the projection with the
    defining expression RE-INLINED into the filter condition — two
    evaluations per row. The wrapper must (a) keep the optimized plan's
    Filter referencing the projected ATTRIBUTE (expression evaluated
    once, in the Project only) and (b) change no values. Round-15
    ADVICE: without this pin, a Spark upgrade that folds the
    rand-tautology guard would silently revert to double evaluation
    (the no_pushdown twin above covers filter placement; this covers
    projection re-inlining)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import evaluate_once

    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd"), (3, None), (4, "ee ff gg hh")],
        "id long, text string",
    ).localCheckpoint(eager=True)
    # an expression whose plan fingerprint is countable: size(split(..))
    expensive = F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))

    plain = df.select("id", expensive.alias("q")).filter(F.col("q") >= 3)
    wrapped = df.select("id", evaluate_once(expensive).alias("q")).filter(
        F.col("q") >= 3
    )

    # value identity (NULL text -> size 1 -> dropped by the threshold)
    assert sorted(r["id"] for r in plain.collect()) == [1, 4]
    assert sorted(r["id"] for r in wrapped.collect()) == [1, 4]
    assert [r["q"] for r in wrapped.orderBy("id").collect()] == [3, 4]

    def n_eval(df_):
        plan = df_._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        return plan.count("split(")

    # plain: the pushed filter re-inlines the expression (2 evals);
    # wrapped: exactly one evaluation, in the Project
    assert n_eval(plain) >= 2
    assert n_eval(wrapped) == 1
    # and the Filter references the attribute, not the expression:
    # the optimized plan's Filter node must not contain "split("
    opt = wrapped._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.split("\n"):
        if line.strip().startswith("Filter"):
            assert "split(" not in line, f"filter re-inlined: {line}"
