"""Distributed k-means (Lloyd) over an embedding column — full-corpus
EXACT centroid updates as skinny moment passes.

Contrast with operators/ivf.py's coarse quantizer, which trains
driver-side on a bounded deterministic sample (the Faiss train/add
split): that trade is right for ANN cell assignment, where recall
tolerates sample drift. Semantic CLUSTERING of a corpus — domain
discovery, cluster-balanced sampling, DoReMi-style mixture design —
wants centroids of ALL vectors. Here each Lloyd iteration is ONE
`mapInPandas` pass that reduces a partition to a single
(k + k·d + 2)-value moment row (per-cluster counts, per-cluster vector
sums, SSE, row count — the same partial-aggregate discipline as
operators/lr.py and operators/pca.py), so the driver sees
≤ numPartitions tiny rows per iteration and the centroid update is the
exact global mean. At 100 TB: `n_iter` embarrassingly-parallel passes
over one narrow vector column, zero shuffles, driver state k·d
doubles.

Determinism: init is the k vectors with the smallest
``md5(cast(id as string))`` (a distributed top-k, no RNG), iteration
count is fixed, and argmin ties break to the lowest cluster index —
so results are reproducible up to cross-partition float summation
order (~1e-12), which the numpy-parity pytest pins
(tests/test_kmeans.py). The features frame is lazily
``localCheckpoint``-ed once: an iterative fit over DERIVED features
must not re-derive them per iteration (SCALE.md rule, the quality_lr
decade bug).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class KMeansModel:
    centers: np.ndarray      # (k, d)
    # total SSE at the centers ENTERING each iteration (assignments
    # recomputed): Lloyd guarantees this sequence is non-increasing —
    # evaluating at the RETURNED centers would cost one more pass
    sse: list[float]
    n_rows: int
    iters: int


def _moment_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
            T.StructField("sse", T.DoubleType()),
        ]
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
) -> KMeansModel:
    """Fit k-means on ``vec_col`` with ``n_iter`` exact Lloyd steps.

    Init: the k rows with the smallest ``md5(id)`` — content-
    independent, engine-reproducible, a bounded ``orderBy().limit(k)``
    top-k (k·d doubles to the driver). Empty clusters keep their
    previous center (the standard Lloyd degeneracy rule; documented so
    the numpy twin can mirror it)."""
    if k < 1:
        raise ValueError("kmeans_fit: k must be >= 1")
    if n_iter < 1:
        # zero iterations would skip the loop and return seed vectors
        # with n_rows=0 — a "fitted" model that never saw the corpus
        raise ValueError("kmeans_fit: n_iter must be >= 1")
    seed_rows = (
        df.select(F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(int(k))
        .collect()
    )
    if len(seed_rows) == 0:
        # family contract (operators/ivf.py, operators/lr.py): fitting
        # on an empty corpus is a caller error, never a silent model
        raise ValueError("kmeans_fit: cannot fit on an empty corpus")
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds the corpus size {len(seed_rows)}"
        )
    centers = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
    d = centers.shape[1]
    features = df.select(vec_col).localCheckpoint(eager=False)
    schema = _moment_schema()
    sse_hist: list[float] = []
    n_total = 0

    for _it in range(int(n_iter)):
        c_now = centers.copy()
        c_sq = (c_now * c_now).sum(axis=1)

        def partials(batches):
            import pandas as pd

            n = 0
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, d), dtype=np.float64)
            sse = 0.0
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                d2 = (
                    (X * X).sum(axis=1, keepdims=True)
                    - 2.0 * (X @ c_now.T)
                    + c_sq
                )
                a = d2.argmin(axis=1)
                counts += np.bincount(a, minlength=k)
                np.add.at(sums, a, X)
                sse += float(
                    np.maximum(d2[np.arange(len(X)), a], 0.0).sum()
                )
                n += len(X)
            yield pd.DataFrame(
                {
                    "n": [n],
                    "counts": [counts.tolist()],
                    "sums": [sums.ravel().tolist()],
                    "sse": [sse],
                }
            )

        rows = features.mapInPandas(partials, schema).collect()
        n_total = sum(r["n"] for r in rows)
        if n_total == 0:
            raise ValueError("kmeans_fit: cannot fit on an empty corpus")
        counts = np.sum(
            [np.asarray(r["counts"], dtype=np.int64) for r in rows], axis=0
        )
        sums = np.sum(
            [np.asarray(r["sums"]).reshape(k, d) for r in rows], axis=0
        )
        sse_hist.append(float(sum(r["sse"] for r in rows)))
        nonempty = counts > 0
        centers = c_now.copy()
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]

    return KMeansModel(
        centers=centers,
        sse=sse_hist,
        n_rows=int(n_total),
        iters=int(n_iter),
    )


def persist_kmeans_model(spark, path: str, model: KMeansModel) -> None:
    """Write a fitted clustering as a small at-rest artifact — centers
    as one parquet table (k rows of ARRAY<DOUBLE> — exact binary
    round trip, so a loaded model assigns BIT-IDENTICALLY) plus a JSON
    meta sidecar (SSE history, corpus size, iteration count). The
    PQ/IVF indexes persist their codebooks (operators/pq.py
    persist_pq_index); a DoReMi-style pipeline reuses ONE clustering
    across sessions for assignment/balance/curriculum the same way —
    without this the fit re-runs per session. Written through the
    Spark writer so the artifact lives on whatever filesystem ``path``
    names (the _save_ndarray rule). Retrain-versioning, when a corpus
    drifts, rides the IVF-PQ ``_CURRENT``-marker recipe unchanged —
    persist each fit under ``path/<version>`` and repoint."""
    import json
    import posixpath

    centers = np.asarray(model.centers, dtype=np.float64)
    rows = [
        (int(i), [float(x) for x in centers[i]])
        for i in range(centers.shape[0])
    ]
    (
        spark.createDataFrame(rows, "row_id INT, center ARRAY<DOUBLE>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(posixpath.join(path, "centers"))
    )
    meta = {
        # float(x) → json repr → float round-trips doubles exactly
        "sse": [float(s) for s in model.sse],
        "n_rows": int(model.n_rows),
        "iters": int(model.iters),
    }
    (
        spark.createDataFrame([(json.dumps(meta),)], "meta string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(posixpath.join(path, "meta"))
    )


def load_kmeans_model(spark, path: str) -> KMeansModel:
    """Read back a :func:`persist_kmeans_model` artifact — a bounded
    driver read (k·d doubles + the scalar history). The loaded model
    is value-identical to the fitted one: assignment over it matches
    bit-for-bit (pinned in tests/test_kmeans.py)."""
    import json
    import posixpath

    rows = (
        spark.read.parquet(posixpath.join(path, "centers"))
        .orderBy("row_id")
        .collect()
    )
    if not rows:
        raise ValueError(f"load_kmeans_model: no centers under {path}")
    centers = np.array([r["center"] for r in rows], dtype=np.float64)
    meta_row = spark.read.parquet(posixpath.join(path, "meta")).first()
    if meta_row is None:
        # a killed persist between its two (non-atomic) writes leaves
        # an empty meta dir — fail loudly naming the artifact, like
        # the empty-centers branch above
        raise ValueError(f"load_kmeans_model: no meta under {path}")
    meta = json.loads(meta_row["meta"])
    return KMeansModel(
        centers=centers,
        sse=[float(s) for s in meta["sse"]],
        n_rows=int(meta["n_rows"]),
        iters=int(meta["iters"]),
    )


def assign_clusters(
    df: DataFrame,
    model: KMeansModel,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Label every row with its nearest-center index (ties to the
    lowest index) — one narrow Arrow pass, the model rides as k·d
    doubles in the task closure; all input columns pass through."""
    if out_col in df.columns:
        raise ValueError(f"assign_clusters: column {out_col!r} already exists")
    centers = np.asarray(model.centers, dtype=np.float64)
    c_sq = (centers * centers).sum(axis=1)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (
                (X * X).sum(axis=1, keepdims=True)
                - 2.0 * (X @ centers.T)
                + c_sq
            )
            out = pdf.copy()
            out[out_col] = d2.argmin(axis=1).astype(np.int32)
            yield out

    return df.mapInPandas(assign, schema)


def _local_cap_per_cluster(
    skinny: DataFrame, cluster_col: str, key_col: str, n: int
) -> DataFrame:
    """Stage 1 of the two-stage top-k: within every Arrow batch, keep
    at most ``n`` rows per cluster by ascending ``key_col`` — one
    NARROW pass (no shuffle, no window). Any row in a cluster's GLOBAL
    top-n is necessarily in its batch's top-n (fewer than n rows of
    the whole corpus precede it, so fewer than n in its batch do), so
    the survivor set always contains the final answer and stage 2's
    window is exact. Survivors are bounded by batches × clusters × n —
    the skinny frame the final per-cluster window actually sorts."""

    def cap(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            yield (
                pdf.sort_values(key_col, kind="stable")
                .groupby(cluster_col, sort=False, dropna=False)
                .head(n)
            )

    return skinny.mapInPandas(cap, skinny.schema)


def sample_balanced_by_cluster(
    df: DataFrame,
    cluster_col: str = "cluster_id",
    n_per_cluster: int = 100,
    id_col: str = "vec_id",
    salt: str = "bal|",
) -> DataFrame:
    """Deterministic cluster-BALANCED subsample: at most
    ``n_per_cluster`` rows per cluster, chosen by ascending
    ``md5(salt || id)`` — content-independent, reproducible, no RNG
    (the q_group_sample reservoir rule applied to learned clusters).
    The flat-per-cluster quota is the mixture-rebalancing primitive:
    head clusters are capped, tail clusters survive whole. ``id_col``
    must be unique (the assign/dedup family contract) — the md5 order
    is then total and the pick is exact, not approximate.

    Scale — two-stage top-k (round-12 VERDICT: the single
    ``Window.partitionBy(cluster)`` form hash-partitioned the ENTIRE
    corpus into |clusters| reducer tasks; with k=8 at 100 TB that is
    8 tasks each sorting ~12.5 TB — the same single-task-concentration
    class operators/ordering.py exists to kill):

      1. project the SKINNY decision frame (id, cluster, md5 key) —
         payload columns never enter the top-k pipeline;
      2. :func:`_local_cap_per_cluster` — a narrow per-batch cap, no
         shuffle, survivors ≤ batches × clusters × n;
      3. the per-cluster ``row_number`` window over ONLY the bounded
         survivor set (a tiny sort, whatever |clusters| is);
      4. recover the payload with a LEFT SEMI join on the winner ids
         (≤ |clusters| × n rows — AQE broadcasts it).

    Results are bit-identical to the one-window form (the md5 order is
    total); the partitioning pytest pins that no shuffle task receives
    a whole cluster's rows."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    skinny = df.select(
        F.col(id_col), F.col(cluster_col), key.alias("__bal_key")
    )
    capped = _local_cap_per_cluster(
        skinny, cluster_col, "__bal_key", int(n_per_cluster)
    )
    rk = F.row_number().over(
        Window.partitionBy(cluster_col).orderBy("__bal_key")
    )
    winners = (
        capped.withColumn("__rk", rk)
        .filter(F.col("__rk") <= int(n_per_cluster))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")
