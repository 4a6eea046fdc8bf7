"""Distributed PCA over an embedding column — the dimensionality
reduction step a training-data pipeline runs before similarity search
and semantic dedup (SemDeDup-style pipelines whiten/reduce embeddings
before clustering; IVF/PQ recall at a byte budget improves when the
energy is packed into the leading dimensions).

Spark-first shape: PCA needs exactly two cluster passes —
(1) accumulate the moment statistics (count, coordinate sums, Gram
matrix) with one Arrow `mapInPandas` over the vector column, reduced
to ONE row per partition before anything leaves the executors; the
driver sees ≤ `numPartitions` rows of (d + d²) doubles, solves the
d×d eigenproblem locally (d is the embedding width — 64..4096 — so
the driver work is microseconds), and (2) a vectorized pandas UDF
projects every vector through the fitted components. No iterative
driver loop, no gradient steps, no collect of data rows — the same
partial-aggregate discipline as every other operator here.

The eigenbasis sign is fixed by convention (largest-|coordinate|
element made positive) so a fit is reproducible up to float summation
order across partitions (~1e-13 on unit-scale data; the parity pytest
pins it against numpy's exact eigensolve)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes, orthonormal
    explained_var: np.ndarray  # (k,) descending
    n_rows: int
    # trace of the covariance (sum of ALL d eigenvalues) — lets callers
    # compute the top-k energy fraction sum(explained_var)/total_var
    # without a second pass (the IVF-PQ auto-build selector's signal)
    total_var: float = 0.0


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8,
            budget_bytes: int = 1 << 30) -> PCAModel:
    """Fit PCA on ``df[vec_col]`` (array<float|double>) and return the
    top-``k`` principal axes. One job; driver receives one moment row
    per partition, byte-bounded by ``budget_bytes`` — when
    ``numPartitions × (d + d²) × 8`` exceeds it, a second executor-side
    fold level reduces the moment rows first (and a single d too wide
    for even one row under the budget fails loudly)."""
    d_probe = df.select(F.size(vec_col).alias("d")).first()
    if d_probe is None:
        # same fail-fast contract as the ANN quantizer family: fitting
        # on an empty corpus is a caller error, never a silent model
        raise ValueError("pca_fit: cannot fit on an empty corpus")
    if d_probe["d"] is None or int(d_probe["d"]) < 1:
        raise ValueError(
            f"pca_fit: column {vec_col!r} holds a NULL/empty vector in the "
            "first row - filter nulls and zero-length vectors before fitting"
        )
    d = int(d_probe["d"])

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def moments(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d, dtype=np.float64)
        g = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            vecs = [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            bad = [
                i for i, v in enumerate(vecs) if v.ndim != 1 or v.shape[0] != d
            ]
            if bad:
                raise ValueError(
                    f"pca_fit: ragged/null vector in {vec_col!r} (first bad "
                    f"batch offset {bad[0]}: shape "
                    f"{vecs[bad[0]].shape}, expected ({d},))"
                )
            m = np.asarray(vecs)
            if m.size == 0:
                continue
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    parts = df.select(vec_col).mapInPandas(moments, schema)
    n_parts = df.rdd.getNumPartitions()
    # Driver-state guard in BYTES, not partition count: each moment row
    # is (d + d²) float64s — at d=4096 one row is ~134 MB, so a
    # partition-count bound alone still admits hundreds of GB. When the
    # collected set would exceed the budget, fold moment rows with a
    # second executor-side aggregation level (streamed — each fold task
    # holds one running (d + d²) accumulator, never the row set).
    row_bytes = (d + d * d) * 8
    if row_bytes > budget_bytes:
        raise ValueError(
            f"pca_fit: one (d + d^2) moment row at d={d} is {row_bytes} "
            f"bytes — beyond the {budget_bytes}-byte driver budget even "
            "after folding; reduce the embedding width first"
        )
    if n_parts * row_bytes > budget_bytes:
        fold_parts = max(1, budget_bytes // row_bytes)

        def fold(batches):
            import pandas as pd

            n = 0
            s = np.zeros(d, dtype=np.float64)
            g = np.zeros(d * d, dtype=np.float64)
            for pdf in batches:
                for i in range(len(pdf)):
                    n += int(pdf["n"].iloc[i])
                    s += np.asarray(pdf["s"].iloc[i], dtype=np.float64)
                    g += np.asarray(pdf["g"].iloc[i], dtype=np.float64)
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.tolist()]}
            )

        # Arrow delivers batches by ROW count (default 10k), so without
        # a cap one fold task would materialize its whole slice of
        # (d + d²)-double rows in a single pandas frame — the very
        # blow-up the fold exists to avoid. Materialize the moment rows
        # FIRST (normal batch size — this is the dominant full-corpus
        # scan and must not run one row at a time), then narrow the
        # Arrow batch cap only for the tiny fold stage; fold() streams
        # row-by-row regardless, so the cap bounds peak memory (4 fat
        # rows ≈ 4·(d+d²) doubles) without per-row scheduling overhead.
        parts = parts.localCheckpoint(eager=True)
        spark = df.sparkSession
        batch_conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
        prev_batch = spark.conf.get(batch_conf, None)
        try:
            spark.conf.set(batch_conf, "4")
            parts = parts.repartition(int(fold_parts)).mapInPandas(
                fold, schema
            ).localCheckpoint(eager=True)
        finally:
            if prev_batch is None:
                spark.conf.unset(batch_conf)
            else:
                spark.conf.set(batch_conf, prev_batch)
    rows = parts.collect()
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: int(k)]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: the largest-|coordinate| entry of each axis
    # is positive (ties broken by the lower index argmax picks)
    for i in range(comps.shape[0]):
        if comps[i, int(np.argmax(np.abs(comps[i])))] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_var=np.maximum(evals[order], 0.0),
        n_rows=int(n),
        total_var=float(np.maximum(evals, 0.0).sum()),
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project ``vec_col`` onto the fitted axes: one vectorized Arrow
    batch matmul per executor batch, (B,d)@(d,k); the (k+1)·d-double
    model rides the UDF closure (a few KB — broadcast with the task)."""
    mean = model.mean
    comps_t = model.components.T  # (d, k)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _project(vs):
        import pandas as pd

        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if m.size == 0:
            return pd.Series([], dtype=object)
        out = (m - mean) @ comps_t
        return pd.Series(list(out))

    return df.withColumn(out_col, _project(F.col(vec_col)))
