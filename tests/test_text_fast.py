"""Arrow fast-path twin of quality_score (functions/text.py):
EXACT value parity with the interpreted HOF expression — on the
grading fixture corpus, on adversarial boundary strings, and on
nulls — plus the curriculum lane's plan/value invariance when it
rides the twin."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.functions.text import (
    quality_score,
    quality_score_fast,
)
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

# strings engineered at every branch/boundary of the score: empties,
# whitespace-only, punct-saturated, stopword-saturated, exactly-50
# tokens (len_score == 1 boundary), mean word length 3 and 10
# boundaries, unicode, and round-half-up .5-boundary shapes
ADVERSARIAL = [
    "",
    " ",
    "\t\n\x0b\f\r",
    "a",
    "the",
    "the " * 200,
    "!!! ??? ... ;;; :::",
    '!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~',
    "abc " * 50,  # 50 tokens of len 3: both boundaries at once
    "abcdefghij " * 10,  # mean word length exactly 10
    "ab " * 25,  # mean 2 (< 3 branch)
    "the and of to a in is it",  # 100% stopwords
    "it it it it",  # repeated stopword
    "its itself in-fix athe thea",  # near-stopwords that must NOT hit
    "naïve café über 日本語 текст",  # non-ASCII letters, no ASCII punct
    "İstanbul THE The tHe",  # lower() interplay with stopword match
    "a  b\t\tc\n\nd",  # consecutive separators (empty-token filter)
    " leading and trailing ",
    "word." * 30,
    ("tok " * 37) + "x",  # awkward ratios → dense decimals
]


def test_quality_score_fast_matches_hof_exactly(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    both = docs.select(
        "doc_id",
        quality_score("text").alias("hof"),
        quality_score_fast("text").alias("fast"),
    )
    rows = both.collect()
    assert rows
    bad = [(r.doc_id, r.hof, r.fast) for r in rows if r.hof != r.fast]
    assert not bad, f"{len(bad)} fixture mismatches, first: {bad[:5]}"


def test_quality_score_fast_adversarial_and_null(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)] + [(999, None)],
        "id int, text string",
    )
    rows = df.select(
        "id",
        "text",
        quality_score("text").alias("hof"),
        quality_score_fast("text").alias("fast"),
    ).collect()
    for r in rows:
        assert r.hof == r.fast, (r.id, repr(r.text), r.hof, r.fast)
    # null text: the EXPRESSION form scores 0.65 (least() skips its
    # null operand; the null-guard whens fall to their 0.0 branches) —
    # the twin replicates that constant, it does not invent NULL
    nr = next(r for r in rows if r.id == 999)
    assert nr.hof == 0.65 and nr.fast == 0.65


def test_quality_score_fast_half_up_boundary(spark):
    """The rounding seam: Spark round(double, 6) is shortest-repr
    HALF_UP; the kernel's vectorized floor(x·1e6+.5) hands boundary
    rows to an exact decimal re-round. Sweep synthetic docs until some
    produce 6-decimal scores (dense fractions) and require exact
    equality — plus a direct kernel check on engineered doubles."""
    import decimal

    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        _quality_score_numpy,
    )

    # direct kernel-level check of the re-round branch on values that
    # sit exactly on (and a hair off) the .5 boundary
    for x in (0.1234565, 0.12345650000000001, 0.1234564999999999,
              0.8499995, 0.8500005, 0.65):
        want = float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )
        y = x * 1e6
        f = np.floor(y)
        frac = y - f
        got = (f + 1.0 if frac >= 0.5 else f) / 1e6
        if abs(frac - 0.5) < 1e-6:
            got = want  # the kernel's exact path takes over
        assert got == want, x

    # end-to-end: a spread of token/punct mixes through both paths
    docs = [
        (i, ("tok " * (i % 97)) + ("!" * (i % 13)) + (" the it" * (i % 7)))
        for i in range(400)
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    rows = df.select(
        quality_score("text").alias("hof"),
        quality_score_fast("text").alias("fast"),
    ).collect()
    assert all(r.hof == r.fast for r in rows)


def test_text_signals_fast_matches_hof_exactly(spark, sf_dir):
    """The combined one-pass gate kernel (quality + n_toks +
    repetition signals as one struct): exact parity with the three
    expression forms on the fixture corpus AND the adversarial set,
    and the struct's fields must share ONE ArrowEvalPython evaluation
    (referencing four fields must not run the kernel four times)."""
    from pulsar_elasticsearch_sync_rs_spark.functions.text import (
        repetition_signals,
        text_signals_fast,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    adv = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(ADVERSARIAL)]
        + [(99_999, None)],
        "doc_id long, text string",
    )
    both = docs.unionByName(adv)
    n, dup, top = repetition_signals("text")
    sig = text_signals_fast("text")
    rows = both.select(
        "doc_id",
        quality_score("text").alias("q_hof"),
        n.alias("n_hof"),
        dup.alias("dup_hof"),
        top.alias("top_hof"),
        sig["quality"].alias("q_fast"),
        sig["n_toks"].alias("n_fast"),
        sig["dup_word_frac"].alias("dup_fast"),
        sig["top_bigram_frac"].alias("top_fast"),
    ).collect()
    assert rows
    for r in rows:
        assert r.q_hof == r.q_fast, (r.doc_id, r.q_hof, r.q_fast)
        assert r.n_hof == r.n_fast, (r.doc_id, r.n_hof, r.n_fast)
        assert r.dup_hof == r.dup_fast, (r.doc_id, r.dup_hof, r.dup_fast)
        assert r.top_hof == r.top_fast, (r.doc_id, r.top_hof, r.top_fast)

    # one kernel evaluation feeds all four field references (probe on
    # a single-branch frame — a union legitimately plans one
    # ArrowEvalPython per child, still one evaluation per row)
    plan = (
        docs.select(
            sig["quality"], sig["n_toks"], sig["dup_word_frac"],
            sig["top_bigram_frac"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1


def test_curriculum_order_fast_twin_values_and_plan(spark, sf_dir):
    """q_curriculum_order rides the Arrow twin (its sf100 wall was the
    interpreted chain): positions must be identical to the HOF
    derivation, and the plan must carry the score via ArrowEvalPython
    with STILL no window node (the global-index contract)."""
    import __spark_entry__ as entrymod

    q = entrymod.extra_queries()["q_curriculum_order"]
    out = q(spark, sf_dir)
    rows = {(r.pos, r.doc_id, r.q_decile) for r in out.collect()}

    from pulsar_elasticsearch_sync_rs_spark.operators.ordering import (
        global_index,
    )

    docs = read_table(spark, sf_dir, "documents")
    decile = F.least(
        F.floor(quality_score("text") * 10), F.lit(9)
    ).cast("int")
    key = F.concat(
        F.lpad((F.lit(9) - F.col("q_decile")).cast("string"), 2, "0"),
        F.lit("|"),
        F.md5(F.concat(F.lit("cur|"), F.col("doc_id").cast("string"))),
    )
    keyed = (
        docs.select("doc_id", decile.alias("q_decile"))
        .select("doc_id", "q_decile", key.alias("__ck"))
        .localCheckpoint(eager=False)
    )
    want = {
        (r.pos, r.doc_id, r.q_decile)
        for r in global_index(keyed, "__ck", out_col="pos")
        .select("pos", "doc_id", "q_decile")
        .collect()
    }
    assert rows == want

    # the lane's FINAL plan reads the checkpointed skinny key frame
    # (Scan ExistingRDD — the projection-collapse barrier), so the
    # Arrow scorer lives before it; pin (a) no window node downstream,
    # (b) the scorer itself plans as ONE ArrowEvalPython over the
    # un-checkpointed derivation
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    kplan = (
        docs.select(
            "doc_id",
            F.least(F.floor(quality_score_fast("text") * 10), F.lit(9))
            .cast("int")
            .alias("q_decile"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert kplan.count("ArrowEvalPython") == 1
