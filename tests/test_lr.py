"""Distributed logistic regression (operators/lr) pinned against a
local numpy IRLS replica on the collected data — the strong-oracle
substitute for a lane no ANSI SQL twin can express (same contract as
tests/test_pca.py)."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from pulsar_elasticsearch_sync_rs_spark.operators.lr import lr_fit, lr_score


def _numpy_irls(x, y, iters, ridge):
    n, p = x.shape
    w = np.zeros(p)
    for _ in range(iters):
        eta = x @ w
        prob = np.where(
            eta >= 0, 1 / (1 + np.exp(-eta)), np.exp(eta) / (1 + np.exp(eta))
        )
        wd = np.maximum(prob * (1 - prob), 1e-10)
        z = eta + (y - prob) / wd
        xw = x * wd[:, None]
        # X'WX is xw.T @ x — xw.T @ xw would square W (a typo that
        # cost a debugging session; the Hessian has ONE W factor)
        w = np.linalg.solve(xw.T @ x + ridge * n * np.eye(p), xw.T @ z)
    return w


def _fixture(spark, n=400, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3))
    true_w = np.array([0.4, 1.5, -2.0, 0.7])
    eta = true_w[0] + x @ true_w[1:]
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(int)
    rows = [(float(a), float(b), float(c), int(t)) for (a, b, c), t in zip(x, y)]
    df = spark.createDataFrame(
        rows, "f1 double, f2 double, f3 double, y int"
    ).repartition(6)
    xb = np.column_stack([np.ones(n), x])
    return df, xb, y.astype(float)


def test_lr_fit_matches_numpy_irls(spark):
    df, xb, y = _fixture(spark)
    model = lr_fit(df, ["f1", "f2", "f3"], "y", iters=8, ridge=1e-6)
    want = _numpy_irls(xb, y, iters=8, ridge=1e-6)
    assert model.n_rows == len(y)
    np.testing.assert_allclose(model.weights, want, atol=1e-9)
    # partitioning-invariant to summation noise
    model2 = lr_fit(df.repartition(2), ["f1", "f2", "f3"], "y", iters=8)
    np.testing.assert_allclose(model2.weights, model.weights, atol=1e-8)
    # the fit actually learned the planted direction (sign + rough scale)
    assert np.sign(model.weights[1:]).tolist() == [1.0, -1.0, 1.0]
    # final loss is finite and below the w=0 baseline ln(2)
    assert 0 < model.log_loss < np.log(2)


def test_lr_score_is_jvm_sigmoid_parity(spark):
    df, xb, y = _fixture(spark, n=120, seed=9)
    model = lr_fit(df, ["f1", "f2", "f3"], "y", iters=6)
    got = (
        lr_score(df, model, ["f1", "f2", "f3"], "p")
        .select("f1", "f2", "f3", "p")
        .collect()
    )
    for r in got:
        eta = model.weights[0] + np.dot(
            model.weights[1:], [r["f1"], r["f2"], r["f3"]]
        )
        assert abs(r["p"] - 1 / (1 + np.exp(-eta))) < 1e-12
    # pure JVM: no Python-crossing nodes in the scoring plan
    plan = (
        lr_score(df, model, ["f1", "f2", "f3"], "p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_lr_guards_and_separable_data(spark):
    # too few rows for the parameter count
    tiny = spark.createDataFrame([(1.0, 1)], "f1 double, y int")
    with pytest.raises(ValueError, match="identify"):
        lr_fit(tiny, ["f1"], "y", iters=2)
    with pytest.raises(ValueError, match="at least one"):
        lr_fit(tiny, [], "y")
    # perfectly separable data: the MLE diverges, the ridge keeps the
    # solve finite and the ordering right
    rows = [(float(i), 1 if i > 0 else 0) for i in range(-20, 21) if i != 0]
    sep = spark.createDataFrame(rows, "f1 double, y int").repartition(3)
    model = lr_fit(sep, ["f1"], "y", iters=10, ridge=1e-4)
    assert np.all(np.isfinite(model.weights))
    assert model.weights[1] > 0

def test_lr_fit_singular_features_pointed_error(spark):
    """Round-10 advice: a constant (or perfectly collinear) feature at
    ridge=0 makes the weighted normal matrix singular — the failure
    must be the module's pointed ValueError, not numpy's bare
    LinAlgError."""
    rows = [(1.0, float(i), i % 2) for i in range(-10, 10)]
    df = spark.createDataFrame(rows, "f_const double, f1 double, y int")
    with pytest.raises(ValueError, match="collinear|constant"):
        lr_fit(df, ["f_const", "f1"], "y", iters=3, ridge=0.0)
    # the same data fits fine with a positive ridge
    model = lr_fit(df, ["f_const", "f1"], "y", iters=3, ridge=1e-3)
    assert np.all(np.isfinite(model.weights))
