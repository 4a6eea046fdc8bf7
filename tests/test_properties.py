"""Property-based tests (hypothesis): the Spark operators agree with
simple Python reference models on randomized inputs.

These run each case batch through ONE Spark job over a generated
DataFrame — settings keep example counts small since each draw costs a
Spark round trip."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from pulsar_elasticsearch_sync_rs_spark.config import RewriteRule
from pulsar_elasticsearch_sync_rs_spark.functions.rewrite import rewrite_index
from pulsar_elasticsearch_sync_rs_spark.operators.rate_limit import rate_limit_per_second

TOPIC_ALPHA = "abcde-"
topics = st.text(alphabet=TOPIC_ALPHA, min_size=1, max_size=12)
patterns = st.text(alphabet="abcde", min_size=1, max_size=4)


def model_rewrite(topic: str, rules: list[RewriteRule]) -> str:
    """Python model of the reference semantics: strip -partition-N,
    anchored first match wins, '.*' stripped from target, fallthrough."""
    base = re.sub(r"-partition-\d+$", "", topic)
    for r in rules:
        pat = r.pattern if r.pattern.startswith("^") else "^" + r.pattern
        if re.search(pat, base):
            return r.target.replace(".*", "")
    return base


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(topics, min_size=1, max_size=8),
    st.lists(
        st.tuples(patterns, st.text(alphabet="xyz.*", min_size=1, max_size=6)),
        min_size=0,
        max_size=5,
    ),
    st.integers(min_value=0, max_value=9),
)
def test_rewrite_matches_model(spark_global, topic_list, rule_tuples, part_n):
    spark = spark_global
    rules = tuple(RewriteRule(p, t) for p, t in rule_tuples)
    full_topics = [t + (f"-partition-{part_n}" if i % 2 else "") for i, t in enumerate(topic_list)]
    df = spark.createDataFrame([Row(topic=t) for t in full_topics])
    got = {
        r["topic"]: r["idx"]
        for r in df.withColumn("idx", rewrite_index("topic", rules)).collect()
    }
    for t in full_topics:
        assert got[t] == model_rewrite(t, list(rules)), (t, rules)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # app
            st.integers(min_value=0, max_value=5),  # second bucket
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=3),  # limit
)
def test_rate_limit_cap_invariant(spark_global, events, limit):
    spark = spark_global
    rows = [
        Row(event_id=i, app=app, ts=f"2024-01-01 00:00:0{sec}")
        for i, (app, sec) in enumerate(events)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    kept = rate_limit_per_second(df, {"a": limit, "b": limit}, tiebreaker="event_id").collect()
    # invariant 1: configured apps never exceed limit per second
    from collections import Counter

    per_bucket = Counter((r["app"], r["ts"]) for r in kept)
    for (app, ts), n in per_bucket.items():
        if app in ("a", "b"):
            assert n <= limit, (app, ts, n, limit)
    # invariant 2: unconfigured app c passes everything
    n_c_in = sum(1 for app, _ in events if app == "c")
    assert sum(1 for r in kept if r["app"] == "c") == n_c_in
    # invariant 3: kept set is the deterministic earliest-by-id prefix
    expect_kept = set()
    counts: Counter = Counter()
    for i, (app, sec) in enumerate(events):  # event_id order == arrival
        if app == "c":
            expect_kept.add(i)
        elif counts[(app, sec)] < limit:
            counts[(app, sec)] += 1
            expect_kept.add(i)
    assert {r["event_id"] for r in kept} == expect_kept


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet="abc 0123456789.-@", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pii_redaction_idempotent_and_clean(spark_global, texts):
    """redact(redact(x)) == redact(x), and no email/SSN/phone/IPv4
    pattern survives one redaction pass (replacement tokens contain no
    digits or '@', so they cannot re-form a match)."""
    import re as _re

    from pyspark.sql import functions as F

    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        PII_PATTERNS,
        redact_pii,
    )

    spark = spark_global
    df = spark.createDataFrame([Row(t=t) for t in texts])
    out = df.select(
        "t",
        redact_pii("t").alias("once"),
        redact_pii(redact_pii("t")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"], r["t"]
        for _, pat, _repl in PII_PATTERNS:
            assert not _re.search(pat, r["once"]), (r["t"], r["once"], pat)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([0.3, 0.5, 0.8]),
)
def test_ngram_size_band_lossless(spark_global, docs, threshold):
    """The size-banded equi-join returns EXACTLY the pairs a
    brute-force all-pairs Jaccard (Python model) finds ≥ threshold —
    the size filter is pruning, never semantics."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    spark = spark_global
    k = 2

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    expected = set()
    for i, a in enumerate(docs):
        for j in range(i + 1, len(docs)):
            sa, sb = shingles(a), shingles(docs[j])
            union = sa | sb
            jac = len(sa & sb) / len(union) if union else 0.0
            if jac >= threshold:
                expected.add((i, j))
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, threshold=threshold, shingle_k=k
        ).collect()
    }
    assert got == expected, (docs, threshold)


@given(
    width=st.integers(min_value=1, max_value=16),
    height=st.integers(min_value=1, max_value=8),
    colors=st.lists(
        st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        ),
        min_size=1,
        max_size=8,
    ),
    every=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=50, deadline=None)
def test_avi_codec_roundtrip_model(width, height, colors, every):
    """Pure-Python property: synth_avi → parse_avi_frames recovers the
    header fields exactly and the sampled solid-frame channel means
    exactly, for arbitrary dimensions (including stride-padding widths),
    frame counts, and sampling strides."""
    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        parse_avi_frames,
        synth_avi,
    )

    blob = synth_avi(width, height, colors)
    meta = parse_avi_frames(blob, sample_every=every)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (
        width, height, len(colors),
    )
    assert meta["duration_ms"] == len(colors) * 100
    assert [f["frame_idx"] for f in meta["frames"]] == list(
        range(0, len(colors), every)
    )
    for fr in meta["frames"]:
        b, g, r = colors[fr["frame_idx"]]
        assert (fr["mean_b"], fr["mean_g"], fr["mean_r"]) == (b, g, r)


@given(
    n_samples=st.integers(min_value=2, max_value=512).filter(lambda n: n % 2 == 0),
    amp=st.integers(min_value=0, max_value=32000),
)
@settings(max_examples=50, deadline=None)
def test_wav_codec_roundtrip_model(n_samples, amp):
    """Pure-Python property: synth_wav → parse_wav recovers sample
    count, duration, and the square wave's exact peak/mean."""
    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        parse_wav,
        synth_wav,
    )

    meta = parse_wav(synth_wav(n_samples, amp))
    assert meta["n_samples"] == n_samples
    assert meta["peak_amp"] == amp
    assert meta["mean_abs"] == float(amp)  # even-length alternating wave
    assert meta["duration_ms"] == n_samples * 1000 // 8000


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_matches_union_find(spark_global, edges):
    """Alternating star contraction must agree with a brute-force
    union-find on arbitrary random graphs (chains, cliques, self-loops,
    duplicates, isolated pairs)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.components import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}

    df = spark_global.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expected


@given(
    payloads=st.lists(
        st.one_of(
            st.text(max_size=40),
            st.text(max_size=10).map(lambda s: '{"k": "' + s.replace('"', "") + '"}'),
            st.sampled_from(
                ['{"a": 1}', "[1,2]", "null", "{broken", '{"app": "x", "t": "1.5"}', "", "   "]
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_etl_chain_total_on_arbitrary_payloads(spark_global, payloads):
    """Robustness property: the full ETL chain is TOTAL over arbitrary
    payload strings (ANSI mode must not abort on malformed JSON — the
    try_cast/dead-letter discipline), and dead_letter_split partitions
    the input exactly: every record lands in main or dead, never both,
    never neither."""
    from pyspark.sql import functions as F

    from pulsar_elasticsearch_sync_rs_spark.config import PipelineConfig
    from pulsar_elasticsearch_sync_rs_spark.operators.filters import dead_letter_split
    from pulsar_elasticsearch_sync_rs_spark.plans.pipeline import etl_transform

    df = spark_global.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "event_id long, value string"
    ).select(
        "event_id",
        "value",
        F.lit("persistent://public/default/t0").alias("topic"),
        F.timestamp_seconds(F.col("event_id")).alias("publish_time"),
    )
    cfg = PipelineConfig(time_key="t")
    out = etl_transform(df, cfg, tiebreaker="event_id")
    n_out = out.count()  # must not raise
    main, dead = dead_letter_split(df, "value")
    assert main.count() + dead.count() == len(payloads)
    # the chain keeps exactly the parseable, non-empty records
    assert n_out <= len(payloads)


@given(
    texts=st.lists(
        st.one_of(
            st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x2500), max_size=30),
            st.sampled_from(
                ["\x01hello world foo", "\tfoo bar", " x ", "\xa0nbsp join\xa0", "a b", ""]
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_py_tokenizer_matches_jvm(spark_global, texts):
    """The Python Arrow-kernel tokenizer must agree with the JVM
    ws_tokens expression on ARBITRARY input — control chars, Unicode
    whitespace (NBSP, line separator), tabs, empties — because the
    minhash/simhash/jaccard UDF lanes claim subset/equality contracts
    against JVM- and oracle-tokenized lanes."""
    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        py_ws_tokens,
        ws_tokens,
    )

    df = spark_global.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    jvm = {
        r["i"]: r["toks"]
        for r in df.select("i", ws_tokens("t").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert py_ws_tokens(t) == jvm[i], repr(t)


@given(
    texts=st.lists(
        st.one_of(
            st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x2500), max_size=40),
            st.sampled_from(
                ["a b c d e", "a a a a", "x", "", " \t ", "w1 w2 w1 w2 w1 w2", "\x0bsplit\x0bhere"]
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_shingles_and_bigrams_match_python_model(spark_global, texts):
    """The zip_with-of-slices shingle/bigram rewrite (the 12×-faster
    shape) must agree with the Python twin / a direct token model on
    ARBITRARY input — this is the regression pin that the perf rewrite
    can never drift the shingle sets the dedup lanes are built on.
    Also pins max_multiplicity == the Counter-mode of the bigram list."""
    from collections import Counter

    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        max_multiplicity,
        py_word_shingles,
        py_ws_tokens,
        word_bigrams,
        word_shingles,
    )

    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            word_shingles("t", 3).alias("sh"),
            word_bigrams("t").alias("bg"),
            max_multiplicity(word_bigrams("t")).alias("mm"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = py_ws_tokens(t)
        assert set(rows[i]["sh"]) == py_word_shingles(t, 3), repr(t)
        expect_bg = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert rows[i]["bg"] == expect_bg, repr(t)
        expect_mm = max(Counter(expect_bg).values()) if expect_bg else 0
        assert rows[i]["mm"] == expect_mm, repr(t)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),         # key
            st.integers(min_value=0, max_value=9),         # value index
            st.sampled_from(["I", "U", "D"]),              # op
            st.integers(min_value=1, max_value=8),         # day offset
        ),
        min_size=0,
        max_size=12,
    ),
    base_keys=st.sets(st.integers(min_value=1, max_value=5), max_size=5),
)
def test_scd2_apply_matches_interval_model(spark_global, changes, base_keys):
    """SCD2 apply vs a tiny sequential interval simulator: for RANDOM
    (deduped) CDC batches over a random base, the snapshot's per-key
    version chains must equal replaying the ops one by one — open
    version closes at the first change, each I/U opens [ts, next_ts),
    D closes and opens nothing, untouched keys and history pass
    through, exactly one open version per surviving key."""
    import datetime as dt

    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_apply

    t0 = dt.datetime(2020, 1, 1)
    day = dt.timedelta(days=1)
    # (key, ts) must be unique — the operator's documented precondition
    seen = set()
    batch = []
    for k, v, op, off in changes:
        if (k, off) in seen:
            continue
        seen.add((k, off))
        batch.append((k, float(v), op, t0 + off * day))
    base_rows = [(k, -1.0, t0 - 30 * day, None, True) for k in sorted(base_keys)]

    # python reference: replay per key in ts order
    want = set()
    by_key: dict = {}
    for k, v, op, ts in sorted(batch, key=lambda r: (r[0], r[3])):
        by_key.setdefault(k, []).append((ts, v, op))
    touched = set(by_key)
    # round-11 ADVICE: a key whose FIRST op is 'D' with no base row is
    # the D-before-I orphan — error mode (the default here) must raise
    # instead of silently dropping it
    orphan = any(
        ops[0][2] == "D" and k not in base_keys
        for k, ops in by_key.items()
    )
    for k in sorted(base_keys):
        if k in touched:
            want.add((k, -1.0, t0 - 30 * day, by_key[k][0][0], False))
        else:
            want.add((k, -1.0, t0 - 30 * day, None, True))
    for k, ops in by_key.items():
        for i, (ts, v, op) in enumerate(ops):
            if op == "D":
                continue
            nxt = ops[i + 1][0] if i + 1 < len(ops) else None
            want.add((k, v, ts, nxt, nxt is None))

    spark = spark_global
    base = spark.createDataFrame(
        base_rows or [(None, None, None, None, None)],
        "k int, v double, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    if not base_rows:
        base = base.filter("k is not null")
    ch = spark.createDataFrame(
        batch or [(None, None, None, None)],
        "k int, v double, op string, ts timestamp",
    )
    if not batch:
        ch = ch.filter("k is not null")
    # duplicate-preserving (multiset) compare: a regression emitting a
    # version row twice (e.g. a branch double-unioning base rows) must
    # FAIL, not be collapsed by set semantics — scd2_as_of's
    # one-row-per-alive-key contract rides on exact multiplicity.
    # (Counter, not sorted(): None valid_to doesn't order vs datetime.)
    from collections import Counter

    if orphan:
        import pytest

        with pytest.raises(Exception, match="no open version"):
            scd2_apply(base, ch, key="k", attrs=["v"]).collect()
        return
    rows = Counter(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(base, ch, key="k", attrs=["v"]).collect()
    )
    assert rows == Counter(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),         # key
            st.integers(min_value=0, max_value=9),         # value index
            st.sampled_from(["I", "U", "D"]),              # op
            st.integers(min_value=1, max_value=8),         # day offset
        ),
        min_size=1,
        max_size=12,
    ),
    base_keys=st.sets(st.integers(min_value=1, max_value=5), max_size=5),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    n_batches=st.integers(min_value=2, max_value=4),
)
def test_scd2_splice_shuffled_batches_match_sequential(
    spark_global, changes, base_keys, seed, n_batches
):
    """Round-10 verdict #1 (round-11 brief): scd2_apply(on_late=
    'splice') applied batch-by-batch in a RANDOM batch order must equal
    the one-shot ordered apply — late batches retro-merge into closed
    history instead of corrupting intervals. Same sequential interval
    model as test_scd2_apply_matches_interval_model."""
    import datetime as dt
    import random as _random

    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_apply

    t0 = dt.datetime(2020, 1, 1)
    day = dt.timedelta(days=1)
    seen = set()
    batch = []
    for k, v, op, off in changes:
        if (k, off) in seen:
            continue
        seen.add((k, off))
        batch.append((k, float(v), op, t0 + off * day))
    base_rows = [(k, -1.0, t0 - 30 * day, None, True) for k in sorted(base_keys)]

    # python reference: replay per key in ts order (one-shot model)
    want = set()
    by_key: dict = {}
    for k, v, op, ts in sorted(batch, key=lambda r: (r[0], r[3])):
        by_key.setdefault(k, []).append((ts, v, op))
    for k in sorted(base_keys):
        if k in by_key:
            want.add((k, -1.0, t0 - 30 * day, by_key[k][0][0], False))
        else:
            want.add((k, -1.0, t0 - 30 * day, None, True))
    for k, ops in by_key.items():
        for i, (ts, v, op) in enumerate(ops):
            if op == "D":
                continue
            nxt = ops[i + 1][0] if i + 1 < len(ops) else None
            want.add((k, v, ts, nxt, nxt is None))

    spark = spark_global
    snap = spark.createDataFrame(
        base_rows or [(None, None, None, None, None)],
        "k int, v double, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    if not base_rows:
        snap = snap.filter("k is not null")

    rng = _random.Random(seed)
    shuffled = list(batch)
    rng.shuffle(shuffled)
    cut = sorted(rng.sample(range(1, len(shuffled) + 1), 
                            min(n_batches - 1, len(shuffled) - 1))) if len(shuffled) > 1 else []
    pieces, lo = [], 0
    for c in cut + [len(shuffled)]:
        if c > lo:
            pieces.append(shuffled[lo:c])
            lo = c
    for piece in pieces:
        ch = spark.createDataFrame(
            piece, "k int, v double, op string, ts timestamp"
        )
        snap = scd2_apply(
            snap, ch, key="k", attrs=["v"], on_late="splice"
        ).localCheckpoint(eager=True)

    from collections import Counter

    # zero-length rows are splice's orphan-delete tombstones — the one
    # documented artifact the in-order replay (which drops a no-op
    # delete outright) does not produce; they must carry null attrs and
    # never be current, and the snapshot MINUS them must equal the
    # ordered replay exactly
    collected = snap.collect()
    for r in collected:
        if r.valid_to is not None and r.valid_to == r.valid_from:
            assert r.v is None and not r.is_current
    rows = Counter(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in collected
        if r.valid_to is None or r.valid_to != r.valid_from
    )
    assert rows == Counter(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=0, max_value=120),
    block=st.integers(min_value=1, max_value=50),
    epoch=st.integers(min_value=0, max_value=5),
)
def test_two_level_epoch_is_block_contiguous_permutation(
    spark_global, n, block, epoch
):
    """epoch_shuffle_two_level over arbitrary (n, block_size, epoch):
    positions are an exact permutation of 0..n-1 and each source
    block's rows occupy one contiguous run — the python-model replica
    (same md5 schedules) agrees position-for-position."""
    import hashlib

    from pulsar_elasticsearch_sync_rs_spark.operators.ordering import (
        epoch_shuffle_two_level,
        global_index,
    )

    from pyspark.sql import functions as F

    spark = spark_global
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    base = global_index(df, "doc_id", out_col="pos")
    out = {
        r.doc_id: r.pos2
        for r in epoch_shuffle_two_level(
            base, "doc_id", epoch=epoch, block_size=block
        ).collect()
    }
    # python model: identical closed-form schedule
    n_blocks = (n + block - 1) // block if n else 0
    order = sorted(
        range(n_blocks),
        key=lambda b: hashlib.md5(f"ep{epoch}|b{b}".encode()).hexdigest(),
    )
    model = {}
    pos2 = 0
    for b in order:
        members = [d for d in range(n) if d // block == b]
        members.sort(
            key=lambda d: (
                hashlib.md5(f"ep{epoch}|{d}".encode()).hexdigest(),
                d,
            )
        )
        for d in members:
            model[d] = pos2
            pos2 += 1
    assert out == model
    assert sorted(out.values()) == list(range(n))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=25), min_size=1, max_size=4
    ),
    weights=st.lists(
        st.integers(min_value=1, max_value=4), min_size=4, max_size=4
    ),
)
def test_interleave_matches_virtual_time_model(spark_global, counts, weights):
    """interleave_by_weight over arbitrary per-source counts and
    weights: the output equals the smallest-virtual-time-first model
    computed in plain python (same exact integer arithmetic), and is
    a gap-free permutation."""
    import math

    from pulsar_elasticsearch_sync_rs_spark.operators.ordering import (
        interleave_by_weight,
    )

    spark = spark_global
    srcs = [f"s{i}" for i in range(len(counts))]
    w = {s: weights[i] for i, s in enumerate(srcs)}
    rows = []
    nid = 0
    for i, s in enumerate(srcs):
        for _ in range(counts[i]):
            rows.append((nid, s))
            nid += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = {
        r.doc_id: r.pos
        for r in interleave_by_weight(df, "src", w, "doc_id").collect()
    }
    lcm = 1
    for v in w.values():
        lcm = lcm * v // math.gcd(lcm, v)
    keyed = []
    for s in srcs:
        ids = sorted(d for d, src in rows if src == s)
        for rank, d in enumerate(ids):
            keyed.append(((rank + 1) * (lcm // w[s]), s, d))
    keyed.sort()
    model = {d: i for i, (_, _, d) in enumerate(keyed)}
    assert out == model
    assert sorted(out.values()) == list(range(len(rows)))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=40), min_size=0, max_size=40
    ),
    cap=st.integers(min_value=1, max_value=24),
)
def test_pack_bins_matches_greedy_class_model(spark_global, toks, cap):
    """pack_bins_by_length over arbitrary token counts and capacity:
    bins match the per-class k=cap//len fill model exactly, every
    non-empty doc placed once, no bin over capacity."""
    from collections import Counter

    from pulsar_elasticsearch_sync_rs_spark.operators.packing import (
        pack_bins_by_length,
    )

    spark = spark_global
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows or [(0, 0)], "doc_id long, n_tok long")
    if not rows:
        df = df.limit(0)
    got = {
        (b.len_class, b.bin_idx): (b.n_docs, b.fill_tokens, b.waste_tokens)
        for b in pack_bins_by_length(df, "n_tok", "doc_id", capacity=cap).collect()
    }
    cls_counts = Counter(min(t, cap) for t in toks if t > 0)
    model = {}
    for cls, n in cls_counts.items():
        k = cap // cls
        full, rem = divmod(n, k)
        for b in range(full):
            model[(cls, b)] = (k, k * cls, cap - k * cls)
        if rem:
            model[(cls, full)] = (rem, rem * cls, cap - rem * cls)
    assert got == model
