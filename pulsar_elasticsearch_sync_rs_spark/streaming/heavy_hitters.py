"""Streaming heavy hitters — Misra–Gries summaries maintained across
micro-batches via ``applyInPandasWithState`` (Misra & Gries 1982,
"Finding repeated elements"; the streaming counterpart of the batch
count-min lane in operators/sketches.py).

Shape: tokens are hash-partitioned into ``n_buckets`` groups (the
state key), and each group keeps a Misra–Gries summary of at most
``capacity`` (token, count) counters — O(n_buckets · capacity) total
state regardless of stream length or vocabulary size. Because a token
hashes to exactly ONE bucket, the classic guarantee holds per bucket:
every token with true count > N_bucket/(capacity+1) is guaranteed
present in its bucket's summary (no false negatives above the
threshold), and each kept estimate underestimates by at most
N_bucket/(capacity+1).

After every micro-batch each updated group emits its full summary
(output mode "update"). Downstream must keep the latest FULL summary
per BUCKET (the rows with that bucket's max ``n_seen``), NOT the
latest row per (bucket, token): a counter decremented out of the
summary emits no tombstone, so a per-token "latest" view would retain
evicted tokens forever and grow unboundedly. The per-bucket view is
the bounded O(n_buckets · capacity) answer to "what are the hot keys
right now" — see tests/test_streaming.py for the canonical read.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("token", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _mg_fold(counters: dict[str, int], tokens, capacity: int) -> None:
    """Fold a token sequence into a Misra–Gries counter dict in place:
    increment if present, insert if room, else decrement ALL (the
    classic step — one decrement round removes one occurrence of
    capacity+1 distinct tokens, bounding total underestimation)."""
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < capacity:
            counters[t] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]


def misra_gries_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bucket = int(key[0])
        if state.exists:
            tokens, counts, n_seen = state.get
            counters = dict(zip(tokens, counts))
        else:
            counters, n_seen = {}, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            _mg_fold(counters, pdf["token"], capacity)
        state.update((list(counters), [counters[t] for t in counters], n_seen))
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "token": list(counters),
                "est_count": [counters[t] for t in counters],
                "n_seen": n_seen,
            }
        )

    return fn


def heavy_hitters_stream(
    df: DataFrame,
    token_col: str = "token",
    n_buckets: int = 8,
    capacity: int = 16,
) -> DataFrame:
    """Apply the stateful Misra–Gries summary to a streaming DataFrame
    with a string ``token_col``. Tokens route to ``xxhash64 % n_buckets``
    groups (canonical string hashing — see SKILL.md's type-sensitivity
    note); each group's summary survives across micro-batches in the
    state store. Output: the updated summaries after each batch."""
    keyed = df.select(
        F.pmod(F.xxhash64(F.col(token_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        F.col(token_col).cast("string").alias("token"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        misra_gries_fn(capacity),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
