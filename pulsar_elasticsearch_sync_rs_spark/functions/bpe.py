"""Byte-pair-encoding tokenization — REAL merge-rule application, the
step between the whitespace/regex pre-tokenizers (functions/text.py)
and trainable-model token accounting. Sequence packing and token
budgeting only mean anything at the granularity the model will
actually see; this module supplies that granularity without shipping
a model: deterministic merge learning on a bounded sample + exact
merge application corpus-wide.

Algorithm (Sennrich et al. 2016, the GPT-2 practice of rank-greedy
merging):

- ``learn_bpe_merges``: count symbol-pair frequencies over a BOUNDED
  driver-side word-frequency sample (same bounded-training-sample
  posture as the IVF/PQ quantizers — vocabulary learning is a
  fixed-size problem regardless of corpus size) and greedily take the
  most frequent pair ``n_merges`` times (ties broken lexicographically
  for determinism).
- ``apply_bpe``: per word, repeatedly merge the LOWEST-RANK applicable
  pair until none applies. Pure function of (word, merges) — applied
  corpus-wide as an Arrow-batched pandas UDF with a per-executor memo
  cache (word→token-count repeats heavily in natural corpora).

The distributed lane counts tokens; ``apply_bpe`` itself returns the
token list so tests can pin exact segmentations.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # end-of-word sentinel, per the original BPE formulation

# ONE tokenizer definition for learning (JVM) and application (Arrow):
# the explicit Java-\s character class, so a \u00a0 (Unicode space)
# cannot make the two phases disagree about word boundaries — the same
# parity convention the DuckDB oracles use (see plans/llm_queries.py).
_WS_CLASS = "[ \t\n\x0b\f\r]+"


def learn_bpe_merges(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Greedy merge learning over a word-frequency table. Deterministic:
    ties break on the pair's lexicographic order."""
    vocab = {tuple(word) + (END,): n for word, n in word_freqs.items() if word}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # highest count; ties -> lexicographically smallest pair
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with rank-greedy merging (always merge the
    lowest-rank applicable pair first — the GPT-2 apply order)."""
    if not word:
        return []
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _word_freq_df(df: DataFrame, text_col: str) -> DataFrame:
    """The lowercase word-frequency table ``(w, n)`` — ONE tokenization
    definition shared by the bounded-sample and exact learners, so a
    boundary tweak can never make the two phases disagree (the parity
    concern the module-level ``_WS_CLASS`` exists for)."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), _WS_CLASS)).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def learn_merges_from_corpus(
    df: DataFrame, text_col: str = "text", n_merges: int = 64, sample_words: int = 20_000
) -> list[tuple[str, str]]:
    """Bounded-sample merge learning: the top-``sample_words`` most
    frequent lowercase words (a FIXED-size driver table at any corpus
    size — word frequency follows Zipf, so the head dominates pair
    counts) feed the greedy learner."""
    rows = (
        _word_freq_df(df, text_col)
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(sample_words)
        .collect()
    )
    return learn_bpe_merges({r["w"]: r["n"] for r in rows}, n_merges)


def learn_merges_distributed(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """EXACT distributed BPE training — the scale path past
    :func:`learn_merges_from_corpus`'s bounded driver sample: pair
    counts come from the WHOLE corpus word-frequency table every step,
    so the learned table is exactly what Sennrich's reference algorithm
    produces on the full data (pytest-pinned against
    :func:`learn_bpe_merges` run on the complete frequency dict). At
    web scale the long tail carries real pair mass and the vocabulary
    itself outgrows any driver sample — here the vocab table stays a
    DataFrame and only ONE (pair, count) row reaches the driver per
    merge step.

    Per step: (1) adjacent symbol pairs via two shifted `slice`s +
    `arrays_zip` (data passes through the lambda's own arguments — the
    re-evaluation pitfall documented in functions/text.py), weighted by
    word frequency, aggregated, global argmax with the SAME
    (-count, pair) lexicographic tie-break as the reference learner;
    (2) one vectorized Arrow pass rewrites the symbol arrays with the
    non-overlapping left-to-right merge. The vocab table is
    localCheckpoint'ed every ``checkpoint_every`` steps — each step
    stacks a Python-UDF layer onto the plan, and without truncation
    step k replans (and would re-execute) a k-deep pipeline.

    Cost: ``n_merges`` × (one skinny shuffle over (pair, count) + one
    narrow Arrow map over the VOCAB table — words, not documents; the
    corpus is read once up front)."""
    import pandas as pd

    vocab = (
        _word_freq_df(df, text_col)
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit(END))
            ).alias("syms"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for step in range(int(n_merges)):
        sz = F.size("syms")
        pairs = (
            vocab.filter(sz >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, sz - 1).alias("a"),
                        F.slice(F.col("syms"), 2, sz - 1).alias("b"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pairs.orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        # factory scope: the select below is LAZY (it executes during
        # the NEXT step's aggregation), and a UDF closing over the loop
        # frame's a/b cells would late-bind to a LATER step's pair —
        # each step needs its own closure cells
        def make_merge_udf(pa: str, pb: str):
            # no signature hints: with pandas imported function-locally
            # the 'pd.Series' annotation is a string PySpark's hint
            # inference rejects; the explicit returnType rules
            @F.pandas_udf(T.ArrayType(T.StringType()))
            def merge_syms(col):
                out = []
                for syms in col:
                    res = []
                    i = 0
                    m = len(syms)
                    while i < m:
                        if i + 1 < m and syms[i] == pa and syms[i + 1] == pb:
                            res.append(pa + pb)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    out.append(res)
                return pd.Series(out)

            return merge_syms

        vocab = vocab.select(
            make_merge_udf(a, b)("syms").alias("syms"), "n"
        )
        if (step + 1) % int(checkpoint_every) == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact BPE token count per document under the given merge table —
    one Arrow pass, per-executor word→count memo (Zipf makes the hit
    rate high), zero shuffle. Also emits the whitespace word count from
    the SAME split, so downstream ratios cannot mix tokenizers."""
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}
    ws_re = re.compile(_WS_CLASS)

    def count(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, int] = {}

        def counts(text: str) -> tuple[int, int]:
            n_bpe = n_ws = 0
            for w in ws_re.split((text or "").lower()):
                if not w:
                    continue
                n_ws += 1
                hit = memo.get(w)
                if hit is None:
                    hit = memo[w] = len(apply_bpe(w, ranks))
                n_bpe += hit
            return n_bpe, n_ws

        for pdf in batches:
            pairs = [counts(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bpe_tokens": [a for a, _ in pairs],
                    "n_ws_tokens": [b for _, b in pairs],
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_bpe_tokens", T.LongType(), False),
            T.StructField("n_ws_tokens", T.LongType(), False),
        ]
    )
    return df.mapInPandas(count, schema)
