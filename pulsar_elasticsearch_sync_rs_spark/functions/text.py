"""Text-analysis expressions for the LLM-pipeline surface
(SURVEY.md §2.9): tokenization, token counting, quality scoring,
language-ID heuristic, shingling, fingerprinting.

All built-in-function expressions (JVM-side). The shingle/minhash
helpers are shared by the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the common GPT-2-style regex family, simplified to Java-regex-safe form).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny stopword lists for the language-ID heuristic (public knowledge)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "est"),
}


# PII scrub patterns (ordered: applied first to last; chosen to parse
# identically under Java regex (Spark) and RE2 (DuckDB oracle) — ASCII
# \d, \b, simple classes only)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(text: Column | str) -> Column:
    """Sequential regex redaction of common PII shapes — the standard
    pre-training scrub pass. Order matters (a phone must be redacted
    before the IPv4 rule could half-match digits); the oracle applies
    the same patterns in the same order."""
    out = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(text: Column | str, kind: str) -> Column:
    """Match count for one PII category on the UNredacted text."""
    text = F.col(text) if isinstance(text, str) else text
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty string -> empty array (split of ''
    yields [''], filtered out so counts match intuition and the oracle)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count_ws(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens via regexp_extract_all."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), F.lit(0)))


def punct_ratio(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    return F.when(n > 0, n_punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = ws_tokens(F.lower(text if not isinstance(text, str) else F.col(text)))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, n_sw.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: rewards moderate
    length, low punctuation density, presence of stopwords, and a sane
    mean word length — the standard cheap pre-filter for LLM training
    corpora (C4-style heuristics).

    SINGLE-PASS shape (round-15): one ``aggregate`` traversal of the
    token array accumulates ``(n_tok, sum_len, n_sw)`` and the
    ``finish`` lambda assembles the whole score — so the expression
    tokenizes the text EXACTLY once and walks the tokens exactly once,
    no matter how the caller uses it (filters included: the previous
    multi-reference form re-inlined the whitespace split ~6× per row
    at every use site, and predicate pushdown re-substitutes aliases
    so no call-site factoring could fix filter contexts — see
    kgrams_from_tokens). Per-token ``lower`` inside the step replaces
    the second tokenize of ``lower(text)``: the tokens are the same
    substrings, so per-char lowercase context (incl. final-sigma) is
    identical. The arithmetic reproduces the original associativity
    term-for-term — bit-identical IEEE doubles, equality pinned
    against the Arrow twin and the DuckDB oracle. NULL text scores
    0.65 — the multi-reference form's (quirky but load-bearing)
    constant: every ratio's when-guard fell to its otherwise-branch
    while ``least`` skipped the NULL len term."""
    text = F.col(text) if isinstance(text, str) else text
    toks = ws_tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    zero = F.struct(
        F.lit(0).alias("n"),
        F.lit(0).cast("double").alias("sum_len"),
        F.lit(0).alias("n_sw"),
    )

    def step(acc, t):
        return F.struct(
            (acc["n"] + F.lit(1)).alias("n"),
            (acc["sum_len"] + F.length(t)).alias("sum_len"),
            (
                acc["n_sw"] + F.array_contains(sw, F.lower(t)).cast("int")
            ).alias("n_sw"),
        )

    def finish(acc):
        n_tok = acc["n"].cast("double")
        mean_wlen = F.when(n_tok > 0, acc["sum_len"] / n_tok).otherwise(F.lit(0.0))
        len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
        wlen_score = F.when(
            (mean_wlen >= 3) & (mean_wlen <= 10), F.lit(1.0)
        ).otherwise(F.lit(0.5))
        punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
        sw_ratio = F.when(
            acc["n"] > 0, acc["n_sw"].cast("double") / acc["n"].cast("double")
        ).otherwise(F.lit(0.0))
        sw_score = F.least(sw_ratio * 4, F.lit(1.0))
        return F.round(
            len_score * 0.3 + wlen_score * 0.2 + punct_score * 0.25 + sw_score * 0.25,
            6,
        )

    # NULL text: aggregate(NULL, …) is NULL, but the multi-reference
    # form scored 0.65 (see docstring) — preserve it explicitly
    return F.when(text.isNull(), F.lit(0.65)).otherwise(
        F.aggregate(toks, zero, step, finish)
    )


# --- Arrow fast-path twin of quality_score -------------------------
#
# quality_score above is an interpreted higher-order-function chain
# (CodegenFallback): every document pays per-element boxed evaluation
# of the tokenize/aggregate lambdas. That form is kept because the
# DuckDB oracle reproduces it expression-for-expression; but the
# round-12 sf100 curriculum probe showed the interpreted chain IS the
# production lane's wall. The twin below computes the IDENTICAL
# values (equality pinned in tests/test_operators.py at the grading
# fixtures plus adversarial boundary strings) through five vectorized
# pandas str.count passes + exact integer arithmetic:
#
#   n_tok        = count of maximal non-whitespace runs
#   sum(len(tok))= length − whitespace-char count   (integers < 2^53,
#                  so the HOF's sequential double sum is bit-equal)
#   n_punct      = count of ASCII \p{Punct} chars
#   n_sw         = whole-token stopword matches on the lowered text
#
# and then the same double expression tree in the same associativity.
# The only non-trivial parity point is Spark's round(double, 6), which
# goes through BigDecimal(Double.toString(x)).setScale(6, HALF_UP) —
# shortest-decimal-repr rounding. The vectorized floor(x·1e6 + .5)
# agrees except when x·1e6 sits within float error of a .5 boundary;
# those rows (|frac − .5| < 1e-6, i.e. ~1-in-5e5 uniformly) are
# re-rounded exactly via decimal.Decimal(repr(x)) — repr() is the same
# shortest-repr algorithm as Double.toString.

# Java/Spark \s is ASCII-only; Python \s is Unicode — share the
# explicit class (the token_count parity rule)
_WS_CLASS = r"[ \t\n\x0B\f\r]"
# Java \p{Punct} = the 32 ASCII punctuation chars, as ranges
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def _round6_half_up(raw):
    """Vectorized Spark ``round(double, 6)``: floor(x·1e6 + .5) with
    the rows inside float error of a .5 boundary re-rounded exactly
    via shortest-repr decimal HALF_UP (repr() shares Double.toString's
    shortest-decimal algorithm). Shared by every fast-twin kernel so
    the rounding seam is implemented once."""
    import decimal

    import numpy as np

    y = raw * 1e6
    f = np.floor(y)
    frac = y - f
    out = np.where(frac >= 0.5, f + 1.0, f) / 1e6
    for i in np.nonzero(np.abs(frac - 0.5) < 1e-6)[0]:
        out[i] = float(
            decimal.Decimal(repr(float(raw[i]))).quantize(
                decimal.Decimal("0.000001"),
                rounding=decimal.ROUND_HALF_UP,
            )
        )
    return out


def _quality_score_numpy(texts):
    """The kernel: pandas Series[str] -> scores float64 ndarray.
    Exact value parity with quality_score INCLUDING the null quirk:
    the expression form scores NULL text 0.65, not NULL — size(null
    array) is null, ``least`` skips null operands (len_score → 1.0),
    the null-condition ``when``s fall to their 0.0 otherwise-branches
    (wlen 0.5, punct 1.0, sw 0.0) and the weighted sum lands on
    1.0·0.3 + 0.5·0.2 + 1.0·0.25 + 0.0·0.25 = 0.65 (verified against
    the live expression in tests/test_text_fast.py)."""
    import numpy as np

    isnull = texts.isna().to_numpy()
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.float64)
    n_tok = s.str.count(_WS_CLASS.replace("[", "[^", 1) + "+").to_numpy(
        dtype=np.float64
    )
    n_ws = s.str.count(_WS_CLASS).to_numpy(dtype=np.float64)
    sum_tok_len = n_chars - n_ws  # exact: both integer-valued
    n_punct = s.str.count(_PUNCT_CLASS).to_numpy(dtype=np.float64)
    low = s.str.lower()
    sw_alt = "|".join(STOPWORDS["en"])
    n_sw = low.str.count(
        rf"(?:^|(?<={_WS_CLASS}))(?:{sw_alt})(?={_WS_CLASS}|$)"
    ).to_numpy(dtype=np.float64)
    n_tok_low = low.str.count(
        _WS_CLASS.replace("[", "[^", 1) + "+"
    ).to_numpy(dtype=np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_wlen = np.where(n_tok > 0, sum_tok_len / n_tok, 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        sw_ratio = np.where(n_tok_low > 0, n_sw / n_tok_low, 0.0)
    len_score = np.minimum(n_tok / 50.0, 1.0)
    wlen_score = np.where((mean_wlen >= 3) & (mean_wlen <= 10), 1.0, 0.5)
    punct_score = 1.0 - np.minimum(punct_ratio * 5, 1.0)
    sw_score = np.minimum(sw_ratio * 4, 1.0)
    # same left-assoc tree as the Column expression
    raw = (
        (len_score * 0.3 + wlen_score * 0.2) + punct_score * 0.25
    ) + sw_score * 0.25

    out = _round6_half_up(raw)
    out[isnull] = 0.65  # the expression form's null-text constant
    return out


def quality_score_fast(text: Column | str) -> Column:
    """Arrow (pandas-UDF) twin of :func:`quality_score` — identical
    values, vectorized evaluation. Use in production lanes where the
    score is a throughput term (curriculum ordering, streaming
    curation gates); keep :func:`quality_score` where a plan must stay
    pure-JVM/expression-shaped. NULL text scores 0.65 — the expression
    form's (quirky but load-bearing) constant, see the kernel."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # no signature type hints: locally-imported pd makes them strings
    # PySpark's hint inference rejects; the explicit returnType rules
    @F.pandas_udf(T.DoubleType())
    def _q(s):
        return pd.Series(_quality_score_numpy(s))

    return _q(F.col(text) if isinstance(text, str) else text)


def _repetition_signals_numpy(texts):
    """Python twin of :func:`repetition_signals` over a pandas Series:
    returns (n_toks float64 w/ NaN-for-null, dup_word_frac,
    top_bigram_frac) with exact value parity — tokens via
    :func:`py_ws_tokens` on the LOWERED text (the HOF tokenizes
    lower(text)), the same IEEE division order, and the shared
    HALF_UP 6-dp rounding. Null text: n NULL, fracs 0.0 (the HOF's
    null-condition whens fall to their otherwise branches)."""
    from collections import Counter

    import numpy as np

    k = len(texts)
    n_arr = np.zeros(k, dtype=np.float64)
    dup = np.zeros(k, dtype=np.float64)
    top = np.zeros(k, dtype=np.float64)
    isnull = texts.isna().to_numpy()
    for i, t in enumerate(texts):
        if not isinstance(t, str):
            continue
        toks = py_ws_tokens(t.lower())
        n = len(toks)
        n_arr[i] = n
        if n > 0:
            dup[i] = 1.0 - float(len(set(toks))) / float(n)
        if n >= 2:
            bigrams = Counter(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
            top[i] = float(max(bigrams.values())) / float(n - 1)
    dup = _round6_half_up(dup)
    top = _round6_half_up(top)
    dup[isnull] = 0.0
    top[isnull] = 0.0
    n_arr[isnull] = np.nan
    return n_arr, dup, top


def text_signals_fast(text: Column | str) -> Column:
    """ONE Arrow pass computing every curation-gate signal — a struct
    ``(quality, n_toks, dup_word_frac, top_bigram_frac)`` with exact
    value parity to :func:`quality_score` + :func:`repetition_signals`
    (equality pinned in tests/test_text_fast.py). The production gate
    (streaming/curation.py, q_llm_pipeline) evaluates three
    interpreted HOF chains per document through the expression forms;
    this twin crosses the text once and hands back four scalars.
    Reference the RETURNED column's fields (``sig["quality"]`` …) so
    the single UDF expression is shared — Catalyst collapses equal
    PythonUDF calls into one ArrowEvalPython evaluation (plan-pinned
    in the tests)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("quality", T.DoubleType()),
            T.StructField("n_toks", T.LongType()),
            T.StructField("dup_word_frac", T.DoubleType()),
            T.StructField("top_bigram_frac", T.DoubleType()),
        ]
    )

    # no signature type hints (locally-imported pd; returnType rules)
    @F.pandas_udf(schema)
    def _sig(s):
        q = _quality_score_numpy(s)
        n_arr, dup, top = _repetition_signals_numpy(s)
        out = pd.DataFrame(
            {
                "quality": q,
                # nullable Int64: NaN → NULL for null text, like
                # size(null array) under the expression form
                "n_toks": pd.array(n_arr, dtype="Int64"),
                "dup_word_frac": dup,
                "top_bigram_frac": top,
            }
        )
        return out

    return _sig(F.col(text) if isinstance(text, str) else text)


def _lang_zero() -> Column:
    return F.struct(*[F.lit(0).alias(f"s_{lg}") for lg in sorted(STOPWORDS)])


def _lang_step(acc: Column, t: Column) -> Column:
    return F.struct(
        *[
            (
                acc[f"s_{lg}"]
                + F.array_contains(
                    F.array(*[F.lit(w) for w in STOPWORDS[lg]]), t
                ).cast("int")
            ).alias(f"s_{lg}")
            for lg in sorted(STOPWORDS)
        ]
    )


def lang_pick(scores_struct: Column | str) -> Column:
    """Argmax over a per-language stopword-hit counter struct
    (``s_<lang>`` fields) — strict > means the FIRST language (sorted
    order) wins ties, pinned for oracle parity. Used as
    :func:`lang_guess`'s aggregate-finish lambda, where the struct is
    the accumulator variable (evaluated once); if called standalone,
    pass a materialized attribute, not a raw aggregate expression."""
    scores_struct = (
        F.col(scores_struct) if isinstance(scores_struct, str) else scores_struct
    )
    langs = sorted(STOPWORDS)
    best = F.lit("unknown")
    acc_score = F.lit(0)
    for lg in langs:
        sc = scores_struct[f"s_{lg}"]
        cond = sc > acc_score
        best = F.when(cond, F.lit(lg)).otherwise(best)
        acc_score = F.when(cond, sc).otherwise(acc_score)
    return best


def lang_guess(text: Column | str) -> Column:
    """N-gram/stopword language-ID heuristic: score each candidate
    language by stopword hits, pick the argmax (ties -> first language
    in sorted order, pinned for oracle parity).

    SINGLE-PASS shape (round-15): ONE `aggregate` traversal
    accumulates all per-language counters in a struct AND the finish
    lambda runs the argmax over the accumulator — so the whole
    expression tokenizes and walks the text exactly once regardless of
    call context. The previous form applied the argmax when-chain to
    the raw aggregate expression, which inlined the aggregate (and its
    tokenize) 2·N_langs times per row (round-15 A/B at sf0.1: 0.286 →
    0.195 s noop for the lang-only select); the naive one-filter-per-
    language form is N_langs full traversals on top of that. These
    higher-order functions are interpreted (CodegenFallback), so every
    redundant reference is paid at full per-element-boxing price.
    NULL text: aggregate(NULL) is NULL, but the multi-reference argmax
    scored NULL comparisons as false and returned 'unknown' — kept via
    the explicit guard."""
    text = F.col(text) if isinstance(text, str) else text
    toks = ws_tokens(F.lower(text))
    return F.when(text.isNull(), F.lit("unknown")).otherwise(
        F.aggregate(toks, _lang_zero(), _lang_step, lang_pick)
    )


def kgrams_from_tokens(toks: Column | str, k: int) -> Column:
    """ALL k-word grams (space-joined, order-preserving, NOT distinct)
    from an ALREADY-TOKENIZED array column — position i of the result
    is the gram starting at token i.

    Shape matters here: ``zip_with`` over k shifted ``slice``s of the
    token array, NOT ``transform(sequence, i -> element_at(toks, i+j))``.
    Higher-order lambdas re-evaluate any OUTER expression they
    reference once per element — with ``element_at(toks, ...)`` inside
    the lambda the whitespace split re-runs O(n·k) times per document
    (measured 12× slower on the fixture corpus). The zip_with form
    references the token array k+2 times (k slices + the length
    guard), which is why ``toks`` should be a MATERIALIZED attribute:
    pass a raw ``ws_tokens(text)`` expression and Catalyst inlines the
    whitespace split into every one of those references (the round-15
    q_substring_dedup plan showed 41 ``split``s per row at k=20 —
    CollapseProject keeps a pre-projected token column separate
    precisely because it is a non-cheap expression referenced more
    than once, so the two-step select costs one split per row). The k
    slices all have length n−k+1, so zip_with never null-pads."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    ln = n - k + 1
    arrs = [F.slice(toks, j + 1, ln) for j in range(k)]
    gram = arrs[0]
    for arr in arrs[1:]:
        gram = F.zip_with(gram, arr, lambda acc, t: F.concat(acc, F.lit(" "), t))
    # the when() guard keeps the negative-length slices of short docs
    # from ever evaluating (CaseWhen branches are lazy)
    return F.when(n >= k, gram).otherwise(F.array().cast("array<string>"))


def word_kgrams(text: Column | str, k: int) -> Column:
    """:func:`kgrams_from_tokens` over ``ws_tokens(text)``. Prefer the
    two-step form — project ``ws_tokens`` into a column first, then
    gram the attribute — wherever the grams feed a Generate/explode or
    a multi-column select (see kgrams_from_tokens' inlining note)."""
    return kgrams_from_tokens(ws_tokens(text), k)


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles from an already-tokenized array column
    (see :func:`kgrams_from_tokens` for the expression-shape note)."""
    return F.array_distinct(kgrams_from_tokens(toks, k))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles — the unit for n-gram Jaccard /
    MinHash. See :func:`kgrams_from_tokens` for the expression-shape
    note (and prefer its two-step form on hot paths)."""
    return F.array_distinct(word_kgrams(text, k))


def bigrams_from_tokens(toks: Column | str) -> Column:
    """All word bigrams (space-joined, order-preserving, NOT distinct)
    from an already-tokenized array column — the unit for repetition
    signals. Fewer than two tokens yields an empty array. Same
    zip_with-of-slices shape (and the same materialize-the-tokens
    advice) as :func:`kgrams_from_tokens`."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    bigram = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, bigram).otherwise(F.array().cast("array<string>"))


def word_bigrams(text: Column | str) -> Column:
    """:func:`bigrams_from_tokens` over ``ws_tokens(text)``."""
    return bigrams_from_tokens(ws_tokens(text))


def max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element in ``arr`` — the mode count —
    computed per-row with ZERO shuffle: sort the array, then one
    ``aggregate`` pass tracks the longest equal-run. The obvious
    explode→groupBy alternative shuffles one row per n-gram of the whole
    corpus just to answer a per-document question; this stays narrow no
    matter the corpus size. Empty array -> 0."""
    sorted_arr = F.array_sort(arr)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        # x == NULL prev yields NULL -> otherwise branch -> run restarts at 1
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        return F.struct(x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(sorted_arr, acc0, step, lambda a: a["best"])


def repetition_signals_from_tokens(
    toks: Column | str,
) -> tuple[Column, Column, Column]:
    """The Gopher-style repetition signals computed from an
    ALREADY-TOKENIZED (and already lowercased) token array column —
    identical values to :func:`repetition_signals`, but the caller
    projects ``ws_tokens(lower(text))`` into an attribute first so the
    whitespace split runs once per row instead of once per reference
    (see :func:`kgrams_from_tokens`). Use in select contexts; filters
    substitute aliases back on predicate pushdown, so the wrapper form
    is equivalent there."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks).cast("bigint")
    dup_word_frac = F.round(
        F.when(
            n > 0,
            F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    top_bigram_frac = F.round(
        F.when(
            n >= 2,
            max_multiplicity(bigrams_from_tokens(toks)).cast("double")
            / (n - 1).cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return n, dup_word_frac, top_bigram_frac


def repetition_signals(text: Column | str) -> tuple[Column, Column, Column]:
    """The Gopher-style repetition signals:
    ``(n_toks, dup_word_frac, top_bigram_frac)`` (fracs 6-dp rounded).
    Shared by the reporting lane (q_repetition_filter) and the curation
    pipeline's gate so the two can never drift; n_toks is returned so
    callers don't re-tokenize for the count."""
    lowered = F.lower(F.col(text) if isinstance(text, str) else text)
    toks = ws_tokens(lowered)
    n = F.size(toks).cast("bigint")
    dup_word_frac = F.round(
        F.when(
            n > 0,
            F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    top_bigram_frac = F.round(
        F.when(
            n >= 2,
            max_multiplicity(word_bigrams(lowered)).cast("double") / (n - 1).cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return n, dup_word_frac, top_bigram_frac


def rolling_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash over
    whitespace tokens, computed with pure integer arithmetic so a SQL
    oracle can reproduce it exactly. fp = sum_i( crc32(tok_i) * (i+1) )
    mod 2^31-1 — order-sensitive, content-sensitive."""
    toks = ws_tokens(text)
    pairs = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: F.crc32(t.cast("binary")) * i.cast("bigint"),
    )
    return F.when(
        F.size(toks) > 0,
        F.aggregate(pairs, F.lit(0).cast("bigint"), lambda a, x: a + x) % F.lit(2147483647),
    ).otherwise(F.lit(0).cast("bigint"))


# --- Python-side twins of the JVM tokenization, for Arrow UDF kernels ----

_JAVA_WS_RE = None  # compiled lazily inside executors


def py_ws_tokens(text: str | None) -> list[str]:
    """Python-side twin of :func:`ws_tokens` with exact SPARK-SQL
    semantics, shared by every Arrow UDF kernel (minhash / simhash /
    jaccard verify) so Python lanes can never drift from the
    JVM/oracle lanes:

    - Spark SQL ``trim()`` strips ONLY the space character U+0020
      (NOT Java ``String.trim``'s <= U+0020 — a leading control char
      like \\x01 stays attached to its token);
    - Spark's ``split`` uses Java ``\\s`` — the ASCII class
      [ \\t\\n\\x0B\\f\\r] — NOT Unicode whitespace, which plain
      ``str.split()`` would also split on, silently changing shingle
      sets for e.g. NBSP-containing documents;
    - empty fragments are filtered, matching ``ws_tokens``' filter."""
    global _JAVA_WS_RE
    if not text:
        return []
    if _JAVA_WS_RE is None:
        import re

        _JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
    stripped = text.strip(" ")
    if not stripped:
        return []
    return [t for t in _JAVA_WS_RE.split(stripped) if t]


def py_word_shingles(text: str | None, k: int) -> set[str]:
    """Python-side twin of :func:`word_shingles` (distinct k-word
    shingles as space-joined strings) over :func:`py_ws_tokens`."""
    toks = py_ws_tokens(text)
    n = len(toks) - k + 1
    if n <= 0:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(n)}

