"""Distributed PCA (operators/pca) pinned against numpy's exact
eigensolve on the collected data — the strong-oracle substitute for a
lane no ANSI SQL twin can express."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.operators.pca import (
    pca_fit,
    pca_transform,
)
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table


def test_pca_matches_numpy_eigensolve(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").repartition(8)
    k = 8
    model = pca_fit(emb, "embedding", k=k)

    x = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    mean_np = x.mean(axis=0)
    cov_np = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov_np)
    order = np.argsort(evals)[::-1][:k]

    assert model.n_rows == x.shape[0]
    np.testing.assert_allclose(model.mean, mean_np, atol=1e-9)
    # axes match numpy's up to sign (sign fixed by convention in ours)
    for i, j in enumerate(order):
        dot = abs(float(model.components[i] @ evecs[:, j]))
        assert dot > 1 - 1e-8, f"axis {i}: |cos|={dot}"
    np.testing.assert_allclose(model.explained_var, evals[order], rtol=1e-8)
    # orthonormal, variance descending
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(k), atol=1e-10
    )
    assert all(
        a >= b for a, b in zip(model.explained_var, model.explained_var[1:])
    )

    # projection parity on a sample, and variance along pc0 is the top
    # eigenvalue
    proj_rows = (
        pca_transform(emb, model, "embedding", "proj")
        .select("vec_id", "proj")
        .orderBy("vec_id")
        .limit(64)
        .collect()
    )
    ids = [r["vec_id"] for r in proj_rows]
    got = np.asarray([r["proj"] for r in proj_rows])
    by_id = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.filter(emb.vec_id.isin(ids)).collect()
    }
    want = np.asarray(
        [(by_id[i] - mean_np) @ evecs[:, order] for i in ids]
    )
    np.testing.assert_allclose(np.abs(got), np.abs(want), atol=1e-8)

    # the fit is partitioning-invariant (same data, different split)
    model2 = pca_fit(emb.repartition(3), "embedding", k=k)
    np.testing.assert_allclose(
        model2.components, model.components, atol=1e-9
    )


def test_pca_guards(spark):
    empty = spark.createDataFrame([], "embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, "embedding", k=2)
    one = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(one, "embedding", k=2)


def test_pca_fold_level_matches_direct_collect(spark, sf_dir):
    """Round-9 ADVICE: the driver guard is byte-scaled — when
    numPartitions x (d + d^2) x 8 exceeds budget_bytes, a second
    executor-side fold level reduces the moment rows before collect.
    The folded fit must be numerically identical (same sums, different
    summation grouping only) and a width too large for even one row
    under the budget must fail loudly."""
    emb = read_table(spark, sf_dir, "embeddings").repartition(8)
    direct = pca_fit(emb, "embedding", k=4)  # default budget: no fold
    # tiny budget forces the fold path: row_bytes = (d + d^2) * 8;
    # 2 rows' worth admits <= 2 folded rows from 8 partitions
    d = len(emb.select("embedding").first()["embedding"])
    row_bytes = (d + d * d) * 8
    folded = pca_fit(emb, "embedding", k=4, budget_bytes=2 * row_bytes)
    np.testing.assert_allclose(folded.mean, direct.mean, atol=1e-12)
    np.testing.assert_allclose(
        folded.components, direct.components, atol=1e-9
    )
    assert folded.n_rows == direct.n_rows
    # d too wide for even ONE moment row under the budget: loud failure
    with pytest.raises(ValueError, match="driver budget"):
        pca_fit(emb, "embedding", k=4, budget_bytes=row_bytes - 1)
