"""Sequence packing: boundary properties of concat-then-chunk packing
(fullness, tiling, lineage) plus the distributed prefix scan against a
pure-Python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)


def _ref_pack(lengths: list[tuple[int, int]], L: int) -> set[tuple[int, int, int, int]]:
    """Pure-Python reference: (doc_id, n_toks) sorted by doc_id →
    {(seq_id, doc_id, begin, end)} fragments."""
    out, off = set(), 0
    for doc_id, n in sorted(lengths):
        for s in range(off // L, (off + n - 1) // L + 1) if n > 0 else []:
            out.add((s, doc_id, max(0, s * L - off), min(n, (s + 1) * L - off)))
        off += n
    return out


def _doc(doc_id: int, n: int) -> Row:
    return Row(doc_id=doc_id, text=" ".join(f"t{i}" for i in range(n)))


def test_pack_matches_reference_on_boundaries(spark):
    """Boundary menu: empty doc, 1-token doc, exactly-L doc, doc ending
    exactly on a window edge, doc spanning 3 windows."""
    L = 8
    lens = [(0, 3), (1, 0), (2, 8), (3, 5), (4, 20), (5, 1), (6, 0), (7, 11)]
    df = spark.createDataFrame([_doc(i, n) for i, n in lens])
    got = {
        (r["seq_id"], r["doc_id"], r["begin_tok"], r["end_tok"])
        for r in pack_sequences(df, seq_len=L).collect()
    }
    assert got == _ref_pack(lens, L)


def test_pack_fullness_and_tiling_random(spark):
    """Random corpus: every sequence but the last is exactly full, each
    doc's fragments tile [0, n) contiguously, fragments are non-empty,
    and per-doc seq ids are consecutive."""
    L = 16
    rng = random.Random(5)
    lens = [(i, rng.choice([0, 1, 3, L - 1, L, L + 1, 5 * L + 7])) for i in range(60)]
    df = spark.createDataFrame([_doc(i, n) for i, n in lens])
    frags = pack_sequences(df, seq_len=L).collect()
    assert frags == [r for r in frags if r["begin_tok"] < r["end_tok"]]  # non-empty
    per_seq: dict[int, int] = {}
    per_doc: dict[int, list] = {}
    for r in frags:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (
            r["end_tok"] - r["begin_tok"]
        )
        per_doc.setdefault(r["doc_id"], []).append(r)
    total = sum(n for _, n in lens)
    last_seq = max(per_seq)
    assert set(per_seq) == set(range(last_seq + 1))  # no sequence gaps
    for s, tok in per_seq.items():
        assert tok == (L if s < last_seq else total - last_seq * L)
    for doc_id, n in lens:
        rows = sorted(per_doc.get(doc_id, []), key=lambda r: r["seq_id"])
        if n == 0:
            assert rows == []
            continue
        seqs = [r["seq_id"] for r in rows]
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))  # consecutive
        assert rows[0]["begin_tok"] == 0 and rows[-1]["end_tok"] == n
        for a, b in zip(rows, rows[1:]):
            assert a["end_tok"] == b["begin_tok"]  # contiguous tiling


def test_exclusive_prefix_sum_is_order_correct(spark):
    """The two-phase scan must match the sequential prefix sum no
    matter how the input rows are physically arranged."""
    rng = random.Random(11)
    vals = [(i, rng.randrange(0, 50)) for i in range(500)]
    shuffled = vals[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame(shuffled, "k long, v long").repartition(13)
    got = {
        r["k"]: r["start_off"]
        for r in exclusive_prefix_sum(df, "k", "v").collect()
    }
    acc = 0
    for k, v in vals:
        assert got[k] == acc, k
        acc += v


def test_exclusive_prefix_sum_prepartitioned_matches(spark):
    """assume_range_partitioned contract (optimization round 15): a
    caller-owned range-partitioned eager checkpoint, narrowed by a
    FILTER (rows drop, partitions may go empty — the q_llm_pipeline
    mix/split shape), yields the same exclusive sums as the default
    path computes over the same surviving rows, with no exchange of
    its own."""
    rng = random.Random(23)
    vals = [(i, rng.randrange(0, 50)) for i in range(500)]
    shuffled = vals[:]
    rng.shuffle(shuffled)
    base = (
        spark.createDataFrame(shuffled, "k long, v long")
        .repartitionByRange(13, "k")
        .localCheckpoint(eager=True)
    )
    # narrow filter between checkpoint and scan — empties partitions
    # whose whole range is filtered out
    kept = base.filter((F.col("k") % 7 != 0) & ((F.col("k") < 100) | (F.col("k") >= 180)))
    got = {
        r["k"]: r["start_off"]
        for r in exclusive_prefix_sum(
            kept, "k", "v", assume_range_partitioned=True
        ).collect()
    }
    acc = 0
    for k, v in vals:
        if k % 7 != 0 and (k < 100 or k >= 180):
            assert got[k] == acc, k
            acc += v
    assert len(got) == sum(
        1 for k, _ in vals if k % 7 != 0 and (k < 100 or k >= 180)
    )


def test_pack_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(df, seq_len=8).count() == 0


def test_chunk_documents_overlap_semantics(spark):
    """Sliding-window chunking pins: window starts every stride while
    start < n, last window short but never empty, overlap text equals
    the shared token range, zero-token docs emit nothing."""
    from pulsar_elasticsearch_sync_rs_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    rows = [
        (1, " ".join(toks)),   # 10 tokens: chunks at 0,4,8 (len 5, stride 4)
        (2, "a b c"),           # shorter than chunk_len: ONE full-doc chunk
        (3, ""),                # zero tokens: no chunks
        (4, " ".join(f"x{i}" for i in range(8))),  # exact 2*stride: starts 0,4
        (5, "y0 y1 y2 y3 y4"),  # n == chunk_len: start 4 would be a pure
                                # suffix of chunk 0 — must NOT be emitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_len=5, stride=4)
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in out.collect()
    }
    assert {k[0] for k in got} == {1, 2, 4, 5}  # doc 3 absent
    # doc 1: starts 0,4,8; ends 5,9,10
    d1 = [got[(1, c)] for c in (0, 1, 2)]
    assert [(r["begin_tok"], r["end_tok"]) for r in d1] == [(0, 5), (4, 9), (8, 10)]
    assert d1[0]["text_chunk"] == "t0 t1 t2 t3 t4"
    assert d1[1]["text_chunk"] == "t4 t5 t6 t7 t8"
    # the overlap (chunk_len - stride = 1 token) is literally shared
    assert d1[0]["text_chunk"].split()[-1] == d1[1]["text_chunk"].split()[0]
    assert d1[2]["text_chunk"] == "t8 t9" and d1[2]["n_tok_chunk"] == 2
    # short doc: one chunk, whole doc
    assert got[(2, 0)]["text_chunk"] == "a b c" and got[(2, 0)]["end_tok"] == 3
    assert (4, 2) not in got  # start 8 == n: no empty window
    # containment rule: chunk 0 already covers all 5 tokens of doc 5,
    # so the start-4 window (a verbatim suffix) is suppressed
    assert got[(5, 0)]["text_chunk"] == "y0 y1 y2 y3 y4"
    assert (5, 1) not in got


def test_pack_bins_by_length_invariants(spark, sf_dir):
    """Length-class bin packing: every non-empty doc lands in exactly
    one bin, no bin exceeds capacity, bins of a class hold exactly
    capacity//class docs except the class's last, over-long docs get
    dedicated bins, and the reported fill/waste add up."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        token_count_ws,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.packing import (
        pack_bins_by_length,
    )
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    C = 256
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tok")
    )
    n_docs = docs.filter(F.col("n_tok") > 0).count()
    bins = pack_bins_by_length(docs, "n_tok", "doc_id", capacity=C).collect()

    assert sum(b.n_docs for b in bins) == n_docs  # total placement
    from collections import defaultdict

    by_class = defaultdict(list)
    for b in bins:
        assert 1 <= b.len_class <= C
        assert b.fill_tokens == b.n_docs * b.len_class <= C
        assert b.waste_tokens == C - b.fill_tokens >= 0
        by_class[b.len_class].append(b)
    for cls, bl in by_class.items():
        k = C // cls
        bl.sort(key=lambda b: b.bin_idx)
        assert [b.bin_idx for b in bl] == list(range(len(bl)))
        for b in bl[:-1]:
            assert b.n_docs == k  # all but the last bin are full
        assert 1 <= bl[-1].n_docs <= k

    # planted: over-long and zero-token docs
    synth = spark.createDataFrame(
        [(1, 500), (2, 300), (3, 0), (4, 128), (5, 128), (6, 128)],
        "doc_id long, n_tok long",
    )
    out = {
        (b.len_class, b.bin_idx): b
        for b in pack_bins_by_length(synth, "n_tok", "doc_id", capacity=C).collect()
    }
    # the two over-long docs clamp to class 256, one per bin
    assert out[(256, 0)].n_docs == 1 and out[(256, 1)].n_docs == 1
    assert out[(256, 0)].waste_tokens == 0
    # three 128-token docs: 2 per bin -> one full, one half bin
    assert out[(128, 0)].n_docs == 2 and out[(128, 0)].waste_tokens == 0
    assert out[(128, 1)].n_docs == 1 and out[(128, 1)].waste_tokens == 128
    # the zero-token doc appears nowhere
    assert sum(b.n_docs for b in out.values()) == 5

    with _pytest.raises(ValueError, match="capacity"):
        pack_bins_by_length(synth, "n_tok", "doc_id", capacity=0)


def test_pack_bins_residual_fill_beats_by_length(spark, sf_dir):
    """Round-15 VERDICT item 5: the mixed-length packer's measured
    total waste at the grading fixture is strictly below
    pack_bins_by_length's, while keeping the invariants — every
    non-empty doc in exactly one bin, no bin over capacity, fill +
    waste = capacity — and the no-window plan pin (the whole schedule
    is rank arithmetic over skinny exchanges, never a per-class
    window over the doc stream)."""
    from pyspark.sql import functions as F

    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        token_count_ws,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.packing import (
        pack_bins_by_length,
        pack_bins_residual_fill,
    )
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    C = 256
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tok")
    )
    n_docs = docs.filter(F.col("n_tok") > 0).count()
    total_tokens = (
        docs.filter(F.col("n_tok") > 0)
        .agg(F.sum(F.least("n_tok", F.lit(C))))
        .first()[0]
    )
    mixed_df = pack_bins_residual_fill(docs, "n_tok", "doc_id", capacity=C)
    mixed = mixed_df.collect()
    bylen = pack_bins_by_length(docs, "n_tok", "doc_id", capacity=C).collect()
    one_round = pack_bins_residual_fill(
        docs, "n_tok", "doc_id", capacity=C, rounds=1
    ).collect()

    # totality + capacity + accounting
    assert sum(b.n_docs for b in mixed) == n_docs
    for b in mixed:
        assert b.fill_tokens <= C and b.waste_tokens == C - b.fill_tokens >= 0
        assert b.n_docs >= 1
    assert sum(b.fill_tokens for b in mixed) == total_tokens
    # waste = bins*C - tokens on both sides; mixed strictly wins here
    waste_mixed = sum(b.waste_tokens for b in mixed)
    waste_bylen = sum(b.waste_tokens for b in bylen)
    waste_one = sum(b.waste_tokens for b in one_round)
    assert waste_mixed < waste_one < waste_bylen, (
        waste_mixed, waste_one, waste_bylen)
    assert len(mixed) < len(bylen)  # fewer bins is the whole game
    # the fixture actually exercises the filler path (non-vacuous)
    assert any(
        b.fill_tokens != b.n_docs * b.len_class for b in mixed
    ), "no bin carries a filler - witness is vacuous"

    # plan pin: no window anywhere (the doc stream is never handed to
    # a per-class or global WindowExec)
    plan = mixed_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

    # degenerate: all-small corpus == by-length exactly
    small_only = docs.filter(F.col("n_tok") * 4 <= C)
    a = sorted(
        (b.len_class, b.bin_idx, b.n_docs)
        for b in pack_bins_residual_fill(
            small_only, "n_tok", "doc_id", capacity=C
        ).collect()
    )
    b_ = sorted(
        (b.len_class, b.bin_idx, b.n_docs)
        for b in pack_bins_by_length(
            small_only, "n_tok", "doc_id", capacity=C
        ).collect()
    )
    assert a == b_
    # degenerate: empty corpus → empty result, same schema
    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    out = pack_bins_residual_fill(empty, "n_tok", "doc_id", capacity=C)
    assert out.collect() == []
    assert out.columns == mixed_df.columns
