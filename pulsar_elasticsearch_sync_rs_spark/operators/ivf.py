"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer scale path complementing sign-LSH (SURVEY.md §2.9).

Classic IVF (Jégou et al., IEEE TPAMI 2011 product-quantization line
of work, public knowledge): k-means the corpus into nlist coarse cells
once (offline), assign each vector to its nearest centroid, and at
query time scan only the nprobe closest cells instead of the corpus.

Spark-first shape:
- quantizer training: bounded-sample numpy Lloyd on the driver (the
  Faiss recipe — see :func:`train_coarse_quantizer`); cell assignment
  of the full corpus: one distributed Arrow/numpy pass;
- the centroid table is tiny (nlist × dim) → broadcast to assign
  queries;
- the probe search is an equi-join on ``cell_id`` (shuffle on a small
  uniform key) followed by exact cosine re-ranking — no corpus-wide
  scan per query.

At 100 TB the cell assignment is a one-off narrow pass persisted next
to the embeddings (partitioned/bucketed by cell_id so probe joins are
co-located); only the probed cells' rows are ever read per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsar_elasticsearch_sync_rs_spark.operators.similarity import cosine


TRAIN_SAMPLE_SIZE = 4096  # Faiss-style bounded quantizer-training sample


def lloyd_kmeans(
    X: np.ndarray, k: int, seed: int = 42, max_iter: int = 20
) -> np.ndarray:
    """Plain-numpy Lloyd iterations on an in-memory sample — shared by
    the IVF coarse quantizer and the PQ sub-quantizers (operators/
    pq.py). Deterministic (seeded init, no empty-cluster respawn:
    an emptied center keeps its previous position)."""
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    # hoist the constant ||x||² term and reuse one distance buffer:
    # the original one-liner allocated three fresh (n, k) temporaries
    # per iteration, each above the glibc mmap threshold, and the
    # mmap/zero-page churn was ~8× the arithmetic (measured round 15:
    # 16 sub-quantizer trainings 0.79 → 0.33 s). Bit-identical values:
    # matmul out= is the same GEMM, d*(-2)+xx == xx-2·d exactly in
    # IEEE (negation and ×2 are exact), addition order unchanged.
    xx = (X * X).sum(axis=1, keepdims=True)
    d = np.empty((len(X), len(centers)))
    for _ in range(max_iter):
        np.matmul(X, centers.T, out=d)
        d *= -2.0
        d += xx
        d += (centers * centers).sum(axis=1)
        assign = d.argmin(axis=1)
        # vectorized mean-per-cluster (scatter-add + bincount) — the
        # per-cluster boolean-mask loop costs k full passes over X per
        # iteration and dominated PQ training (16 subspaces × 64
        # clusters); results are identical (same row order, sum/count)
        sums = np.zeros_like(centers)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=len(centers)).astype(np.float64)
        new_centers = np.where(
            counts[:, None] > 0, sums / np.maximum(counts[:, None], 1.0), centers
        )
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return centers


def bounded_training_sample(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    sample_size: int = TRAIN_SAMPLE_SIZE,
) -> np.ndarray:
    """The deterministic bounded quantizer-training sample shared by
    IVF and PQ: hash-ordered top-N (TakeOrdered on crc32(id) —
    unbiased w.r.t. any corpus clustering, reproducible across runs and
    partitionings), size FIXED and independent of corpus size, so
    driver memory stays O(sample_size · dim) at any scale."""
    rows = (
        corpus.select(
            F.col(vec_col).alias("v"),
            F.crc32(F.col(id_col).cast("string").cast("binary")).alias("__r"),
        )
        .orderBy("__r")
        .limit(sample_size)
        .select("v")
        .collect()
    )
    if not rows:
        raise ValueError(
            "cannot train a quantizer on an empty corpus "
            f"(no rows in {vec_col!r} after filters)"
        )
    return np.array([r["v"] for r in rows], dtype=np.float64)


def train_coarse_quantizer(
    corpus: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_size: int = TRAIN_SAMPLE_SIZE,
) -> np.ndarray:
    """Train the k-means coarse quantizer on a BOUNDED sample,
    driver-side numpy Lloyd iterations (the Faiss training recipe: a
    coarse quantizer never trains on the full corpus — Faiss defaults
    to ~39×nlist..256×nlist samples). The sample is a deterministic
    hash-ordered top-N (TakeOrdered on crc32(id): unbiased w.r.t. any
    corpus clustering, reproducible across runs and partitionings),
    its size FIXED and independent of corpus size — so the only
    driver-side collect in the IVF family is O(sample_size · dim)
    no matter how large the corpus. Iterations are numpy on the
    driver: 20 Lloyd steps on ≤4096 vectors are microseconds, versus
    20 distributed jobs for a cluster-wide k-means whose per-job
    scheduling overhead dominated the previous implementation."""
    X = bounded_training_sample(corpus, id_col, vec_col, sample_size)
    return lloyd_kmeans(X, nlist, seed=seed, max_iter=max_iter)


def build_ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    id_col: str = "vec_id",
):
    """Train the coarse quantizer (bounded-sample, driver-side — see
    :func:`train_coarse_quantizer`) and assign every corpus vector to
    its nearest cell with ONE distributed Arrow/numpy pass. Returns
    (assigned_corpus_df_with_cell_id, centers ndarray)."""
    centers = train_coarse_quantizer(
        corpus, id_col=id_col, vec_col=vec_col, nlist=nlist, seed=seed, max_iter=max_iter
    )
    probe1 = make_cell_probe_udf(centers, nprobe=1)
    assigned = corpus.withColumn(
        "cell_id", F.element_at(probe1(F.col(vec_col)), 1)
    )
    return assigned, centers


def make_cell_probe_udf(centers: np.ndarray, nprobe: int):
    """Vectorized query→[cell ids] assignment: argsort of distances to
    the broadcast centroid matrix, top nprobe."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vec: pd.Series) -> pd.Series:
        vm = np.array(vec.tolist(), dtype=np.float64)
        # squared L2 distance to each center: ||v||² - 2 v·c + ||c||²
        d = (
            (vm * vm).sum(axis=1, keepdims=True)
            - 2.0 * (vm @ centers.T)
            + (centers * centers).sum(axis=1)
        )
        idx = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return probe_cells


def embedding_near_dup_ivf(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs via IVF cell blocking — the bucketed
    path for MODERATE cosine thresholds where sign-LSH collision
    probability collapses (see similarity.embedding_near_dup's regime
    note).

    Shape (the standard IVF index/probe asymmetry): each vector is
    INDEXED once, in its primary (nearest) cell; each vector PROBES its
    ``nprobe`` nearest cells. A pair is a candidate when one endpoint
    probes the other's primary cell.

    The candidate "join" is never materialized as rows: probe and
    index sides are COGROUPED per cell and the within-cell pair
    enumeration happens inside one numpy matmul per cell
    (``cogroup(...).applyInPandas``), emitting ONLY pairs that pass
    the exact cosine threshold. What shuffles is corpus×(nprobe+1)
    narrow (id, vector) rows on uniform cell keys — ~5 MB at this
    fixture versus ~0.5 GB when 10⁶ candidate rows each carried two
    64-float vectors through join-back (the previous shape; 3.0 s →
    see BENCH_r4). At 100 TB: grow ``nlist`` with the corpus so cells
    stay bounded; per-cell work is a dense BLAS matmul."""
    assigned, centers = build_ivf_index(df, vec_col, nlist=nlist, seed=seed, id_col=id_col)
    index = assigned.select(F.col(id_col).alias("vid"), "cell_id", F.col(vec_col).alias("v"))
    probe = make_cell_probe_udf(centers, nprobe)
    probes = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.explode(probe(F.col(vec_col))).alias("cell_id"),
    )

    # preserve the caller's id type (string ids worked before the
    # cogroup rewrite and must keep working)
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def verify_cell(key, probe_pdf: pd.DataFrame, index_pdf: pd.DataFrame) -> pd.DataFrame:
        if probe_pdf.empty or index_pdf.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine_sim"])
        P = np.array(probe_pdf["v"].tolist(), dtype=np.float64)
        M = np.array(index_pdf["v"].tolist(), dtype=np.float64)
        pn = np.linalg.norm(P, axis=1, keepdims=True)
        mn = np.linalg.norm(M, axis=1, keepdims=True)
        den = pn @ mn.T
        sims = np.round(np.where(den > 0, (P @ M.T) / np.where(den == 0, 1.0, den), 0.0), 6)
        pids = probe_pdf["vid"].to_numpy()
        mids = index_pdf["vid"].to_numpy()
        pi, mi = np.nonzero((sims >= threshold) & (pids[:, None] != mids[None, :]))
        a, b = pids[pi], mids[mi]
        # np.where (not np.minimum) so object/string id arrays order
        # correctly too
        lo = np.where(a <= b, a, b)
        hi = np.where(a <= b, b, a)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine_sim": sims[pi, mi]})

    hits = (
        probes.groupBy("cell_id")
        .cogroup(index.groupBy("cell_id"))
        .applyInPandas(verify_cell, out_schema)
    )
    # a pair can surface from several probed cells → one shuffle over
    # the (small) surviving-pair set, not the candidate set
    return hits.dropDuplicates(["id_a", "id_b"])


def persist_ivf_index(
    corpus: DataFrame,
    table_name: str,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    n_buckets: int = 16,
    seed: int = 42,
):
    """Materialize the cell-assigned corpus as a Spark-native BUCKETED
    table (``bucketBy(cell_id)`` + ``sortBy(cell_id)``): the one-off
    offline pass of IVF at scale. Any subsequent equi-join on
    ``cell_id`` between two reads of this table — the near-dup
    self-join, or a probe set written with the same bucketing — is
    shuffle-free: the bucket layout satisfies the join's distribution
    requirement, so Catalyst plans a SortMergeJoin with NO Exchange on
    the corpus side (asserted in tests). At 100 TB this is the
    difference between re-shuffling the corpus per probe batch and
    reading only co-located buckets. Returns the centroid matrix."""
    assigned, centers = build_ivf_index(corpus, vec_col, nlist=nlist, seed=seed, id_col=id_col)
    (
        assigned.write.mode("overwrite")
        .bucketBy(n_buckets, "cell_id")
        .sortBy("cell_id")
        .option("path", path)
        .saveAsTable(table_name)
    )
    return centers


def ivf_candidates_bucketed(
    spark,
    table_name: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate-pair generation against the persisted bucketed index:
    self-join on ``cell_id``. Both sides scan the same bucketed table,
    so the join needs no shuffle (see persist_ivf_index)."""
    t = spark.table(table_name).select(id_col, "cell_id")
    x, y = t.alias("x"), t.alias("y")
    return x.join(
        y,
        (F.col("x.cell_id") == F.col("y.cell_id"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(
        F.col(f"x.{id_col}").alias("id_a"),
        F.col(f"y.{id_col}").alias("id_b"),
        F.col("x.cell_id").alias("cell_id"),
    )


def knn_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest cells per query,
    exact cosine re-rank inside the probed cells only."""
    from pyspark.sql import Window

    assigned, centers = build_ivf_index(corpus, vec_col, nlist=nlist, seed=seed, id_col=id_col)
    probe = make_cell_probe_udf(centers, nprobe)
    q = queries.select(F.col(query_id), F.col("query_vec")).withColumn(
        "cell_id", F.explode(probe(F.col("query_vec")))
    )
    cand = assigned.join(F.broadcast(q), "cell_id")
    sim = cand.withColumn("sim", cosine(F.col("query_vec"), F.col(vec_col))).filter(
        F.col(id_col) != F.col(query_id)
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.round("sim", 6).alias("cosine_sim"),
        )
    )
