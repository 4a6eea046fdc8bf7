"""Distributed logistic regression — the quality-classifier trainer a
training-data pipeline runs over weak labels (fastText-style quality
filters, CCNet's lang/quality gates): fit a small linear model on
per-document features, score every document, keep the top slice.

Spark-first shape (same partial-aggregate discipline as
operators/pca.py): each IRLS iteration is ONE `mapInPandas` pass that
reduces a partition to a single (d² + d + 2)-double moment row —
X'WX (the weighted Gram), X'Wz (the working response), log-loss and
row count — so the driver sees ≤ numPartitions tiny rows per
iteration and solves a d×d system locally (d = feature count, single
digits for quality features; microseconds). No gradient schedule to
tune: IRLS (Newton on the log-likelihood) converges in a handful of
iterations, each a full corpus pass — at 100 TB, `iters` passes over
a narrow projection of the features, embarrassingly parallel.

Determinism: fixed zero init, fixed iteration count, L2 ridge for a
unique optimum. Cross-partition float summation order still varies
with partitioning, so coefficients are reproducible to ~1e-12 — the
lane is rows-only and the numpy-parity pytest pins the math
(tests/test_lr.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class LRModel:
    weights: np.ndarray   # (d+1,) — bias first
    n_rows: int
    # mean log-loss at the weights ENTERING the final IRLS step (the
    # moment pass that produced `weights`) — evaluating at the returned
    # weights would cost one more full corpus pass; near convergence
    # the two differ negligibly, but callers comparing models on this
    # field should know which iterate it describes
    log_loss: float
    iters: int


def _moment_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("xtwx", T.ArrayType(T.DoubleType())),
            T.StructField("xtwz", T.ArrayType(T.DoubleType())),
            T.StructField("loss", T.DoubleType()),
        ]
    )


def lr_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    ridge: float = 1e-6,
) -> LRModel:
    """Fit binary logistic regression of ``label_col`` (0/1) on
    ``feature_cols`` (numeric) via IRLS. Returns bias-first weights.

    Each iteration: executors accumulate X'WX / X'Wz on their
    partitions (one moment row each, W = p(1-p) at the current
    weights), driver solves the (d+1)×(d+1) ridge system. The ridge
    both regularizes and keeps the solve defined under separable data
    (where the MLE diverges)."""
    d = len(feature_cols)
    if d == 0:
        raise ValueError("lr_fit: need at least one feature column")
    cols = [F.col(c).cast("double").alias(c) for c in feature_cols]
    lab = F.col(label_col).cast("double").alias("__y")
    data = df.select(*cols, lab)
    p = d + 1  # bias column prepended
    wts = np.zeros(p, dtype=np.float64)
    n_total = 0
    loss = float("nan")
    schema = _moment_schema()

    for _it in range(int(iters)):
        w_now = wts.copy()

        def moments(batches):
            import pandas as pd

            n = 0
            xtwx = np.zeros((p, p), dtype=np.float64)
            xtwz = np.zeros(p, dtype=np.float64)
            loss_sum = 0.0
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.column_stack(
                    [np.ones(len(pdf))]
                    + [pdf[c].to_numpy(dtype=np.float64) for c in feature_cols]
                )
                y = pdf["__y"].to_numpy(dtype=np.float64)
                eta = x @ w_now
                # numerically-stable sigmoid + log-loss
                prob = np.where(
                    eta >= 0,
                    1.0 / (1.0 + np.exp(-eta)),
                    np.exp(eta) / (1.0 + np.exp(eta)),
                )
                wdiag = np.maximum(prob * (1.0 - prob), 1e-10)
                z = eta + (y - prob) / wdiag
                xw = x * wdiag[:, None]
                xtwx += xw.T @ x
                xtwz += xw.T @ z
                loss_sum += float(
                    np.sum(np.logaddexp(0.0, eta) - y * eta)
                )
                n += len(pdf)
            yield pd.DataFrame(
                {
                    "n": [n],
                    "xtwx": [xtwx.ravel().tolist()],
                    "xtwz": [xtwz.tolist()],
                    "loss": [loss_sum],
                }
            )

        rows = data.mapInPandas(moments, schema).collect()
        n_total = sum(r["n"] for r in rows)
        if n_total == 0:
            # family contract (operators/ivf.py, operators/pca.py):
            # fitting on an empty corpus is a caller error, never a
            # silent model
            raise ValueError("lr_fit: cannot fit on an empty corpus")
        if n_total < p:
            raise ValueError(
                f"lr_fit: {n_total} rows cannot identify {p} parameters"
            )
        xtwx = np.sum(
            [np.asarray(r["xtwx"]).reshape(p, p) for r in rows], axis=0
        )
        xtwz = np.sum([np.asarray(r["xtwz"]) for r in rows], axis=0)
        loss = sum(r["loss"] for r in rows) / n_total
        try:
            wts = np.linalg.solve(xtwx + ridge * n_total * np.eye(p), xtwz)
        except np.linalg.LinAlgError as e:
            # constant or perfectly collinear feature columns make the
            # weighted normal matrix singular at ridge=0 — name the
            # cause instead of leaking numpy's bare "Singular matrix"
            # (the empty-corpus and n<p paths both get pointed errors,
            # this one should too; round-10 advice)
            raise ValueError(
                "lr_fit: singular normal matrix — a feature column is "
                "constant or perfectly collinear with another (or with "
                "the intercept); drop the redundant feature or pass "
                "ridge > 0"
            ) from e

    return LRModel(
        weights=wts, n_rows=int(n_total), log_loss=float(loss), iters=int(iters)
    )


def lr_score_expr(model: LRModel, feature_exprs: list) -> object:
    """The keep-probability as a COLUMN EXPRESSION over arbitrary
    feature expressions (not just named columns) — so a fitted model
    plugs straight into any predicate slot, e.g. the streaming
    curation gate (``run_curation_ingest(gate_pred=lr_score_expr(...)
    >= p_min)``). Pure JVM: linear form + sigmoid from built-ins,
    whole-stage codegen, the model rides as (d+1) literals."""
    w = model.weights
    if len(feature_exprs) != len(w) - 1:
        raise ValueError(
            f"lr_score_expr: model has {len(w) - 1} features, got "
            f"{len(feature_exprs)} expressions"
        )
    eta = F.lit(float(w[0]))
    for i, e in enumerate(feature_exprs):
        eta = eta + F.lit(float(w[i + 1])) * e.cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


def lr_score(
    df: DataFrame,
    model: LRModel,
    feature_cols: list[str],
    out_col: str = "p_keep",
):
    """Score rows with the fitted model — a PURE JVM expression (the
    linear form + sigmoid as built-in functions, whole-stage codegen,
    no Python in the hot path; the model is (d+1) literals)."""
    return df.withColumn(
        out_col, lr_score_expr(model, [F.col(c) for c in feature_cols])
    )
