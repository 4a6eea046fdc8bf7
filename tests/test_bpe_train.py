"""Distributed BPE training (functions/bpe.learn_merges_distributed)
pinned EXACTLY against the reference greedy learner run on the full
word-frequency dict — the strong oracle for an iterative lane no SQL
twin can express."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.functions.bpe import (
    apply_bpe,
    learn_bpe_merges,
    learn_merges_distributed,
)
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

_WS = re.compile("[ \t\n\x0b\f\r]+")


def _full_freqs(docs):
    freq: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in _WS.split((r["text"] or "").lower()):
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def test_distributed_bpe_matches_reference_learner(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    want = learn_bpe_merges(_full_freqs(docs), 24)
    got = learn_merges_distributed(docs, "text", n_merges=24, checkpoint_every=8)
    assert got == want  # exact, merge by merge — same tie-breaks
    # the learned table actually segments: a frequent word compresses
    ranks = {p: i for i, p in enumerate(got)}
    top_word = max(_full_freqs(docs).items(), key=lambda kv: kv[1])[0]
    assert len(apply_bpe(top_word, ranks)) < len(top_word) + 1


def test_distributed_bpe_ties_and_degenerate_inputs(spark):
    # planted tie: "ab" and "cd" pairs both appear twice; ('a','b') must
    # win lexicographically in BOTH learners
    df = spark.createDataFrame(
        [("ab ab cd cd",)], "text string"
    )
    got = learn_merges_distributed(df, "text", n_merges=3)
    want = learn_bpe_merges({"ab": 2, "cd": 2}, 3)
    assert got == want and got[0] == ("a", "b")
    # empty corpus: no merges, no error
    empty = spark.createDataFrame([], "text string")
    assert learn_merges_distributed(empty, "text", n_merges=4) == []
    # single-char words exhaust the pair space early and stop cleanly
    tiny = spark.createDataFrame([("a a b",)], "text string")
    got2 = learn_merges_distributed(tiny, "text", n_merges=10)
    assert got2 == learn_bpe_merges({"a": 2, "b": 1}, 10)
