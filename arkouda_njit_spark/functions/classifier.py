"""Learned quality classifier: distributed logistic regression (IRLS).

The standard corpus-pipeline step the heuristic filters feed into: CCNet
and the GPT-3/PaLM data recipes train a linear classifier on
"reference-like vs crawl" labels and keep documents by predicted
quality. This module trains exactly that — binary logistic regression —
Spark-first:

* **One aggregation per Newton step.** IRLS needs the gradient
  ``Xᵀ(p − y)`` and Hessian ``XᵀWX`` (W = p(1−p) diagonal). For k
  features both are k(k+3)/2 + 1 scalar sums — computed in a SINGLE
  map-side-combined ``agg`` over the corpus per iteration. No shuffle of
  rows at all: the only thing that moves is the partial-sum tree.
* **Driver-held model.** w is k+1 floats; each iteration bakes it into
  the plan as literals (the broadcast-model regime at its smallest).
  The k×k Newton solve runs on the driver in numpy. ``MAX_FEATURES``
  raises past the point where the per-row expression list stops being
  sensible (k² column expressions) — the honest boundary, stated.
* **Deterministic up to float-sum order.** Full-batch (no sampling, no
  row-order dependence beyond non-associative float addition); the
  parity test pins the fitted weights against a numpy IRLS replay of
  the same algorithm to 1e-8.

``score`` applies the fitted model as one column expression
(sigmoid(w·x)) — the 100 TB filter pass is a pure projection.

Reference parity: no counterpart in the reference (it has no text
pipeline); §2.7 beyond-reference block, quality family
(SURVEY `functions/text.py` rows).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_logistic", "logistic_score", "score"]

#: k² per-row expressions stop being a sensible plan shape well before
#: this; past it you want SIMD batches (mapInPandas) or MLlib's
#: summarizer, not a literal expression list.
MAX_FEATURES = 64


def _sigmoid_col(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def _dot(features: list[str], w: np.ndarray) -> Column:
    """w·x + b as one column expression; w holds [b, w1..wk]."""
    z = F.lit(float(w[0]))
    for i, f in enumerate(features):
        z = z + F.lit(float(w[i + 1])) * F.col(f).cast("double")
    return z


def train_logistic(
    df: DataFrame,
    features: list[str],
    label: str = "label",
    iterations: int = 12,
    l2: float = 1e-6,
    tol: float = 1e-10,
) -> dict:
    """Fit binary logistic regression; returns
    ``{"intercept": b, "weights": {feature: w}, "iterations": n}``.

    ``label`` must be 0/1. ``l2`` is ridge regularization on the
    non-intercept weights (also what keeps the Newton solve
    well-conditioned on separable data). Stops early when the max
    absolute weight update drops below ``tol``.
    """
    k = len(features)
    if k == 0:
        raise ValueError("at least one feature column required")
    if k > MAX_FEATURES:
        raise ValueError(
            f"{k} features > MAX_FEATURES={MAX_FEATURES}: the literal "
            "expression-list plan stops being sensible; batch the dot "
            "products through Arrow instead"
        )
    # Nulls make the per-feature sums skip different row subsets (F.sum
    # ignores null terms per-expression), silently fitting gradient and
    # Hessian over inconsistent populations — drop incomplete rows up
    # front so every sum ranges over the same rows (round-5 ADVICE #2).
    df = df.na.drop(subset=[*features, label])
    w = np.zeros(k + 1)
    n_iter = 0
    for it in range(iterations):
        n_iter = it + 1
        p = _sigmoid_col(_dot(features, w))
        r = p - F.col(label).cast("double")     # gradient residual
        wt = p * (1.0 - p)                      # IRLS weight
        cols = [F.sum(r).alias("g0"), F.sum(wt).alias("h00")]
        for i, fi in enumerate(features):
            xi = F.col(fi).cast("double")
            cols.append(F.sum(r * xi).alias(f"g{i + 1}"))
            cols.append(F.sum(wt * xi).alias(f"h0{i + 1}"))
            for j, fj in enumerate(features[: i + 1]):
                xj = F.col(fj).cast("double")
                cols.append(F.sum(wt * xi * xj).alias(f"h{i + 1}{j + 1}"))
        row = df.agg(*cols).collect()[0]
        if row["h00"] is None:
            raise ValueError(
                "train_logistic: no complete rows (empty input, or every "
                "row had a null feature/label)"
            )

        g = np.zeros(k + 1)
        H = np.zeros((k + 1, k + 1))
        g[0] = row["g0"]
        H[0, 0] = row["h00"]
        for i in range(1, k + 1):
            g[i] = row[f"g{i}"]
            H[0, i] = H[i, 0] = row[f"h0{i}"]
            for j in range(1, i + 1):
                H[i, j] = H[j, i] = row[f"h{i}{j}"]
        # ridge on non-intercept weights
        g[1:] += l2 * w[1:]
        H[1:, 1:] += l2 * np.eye(k)
        step = np.linalg.solve(H, g)
        w = w - step
        if float(np.max(np.abs(step))) < tol:
            break
    return {
        "intercept": float(w[0]),
        "weights": {f: float(w[i + 1]) for i, f in enumerate(features)},
        "iterations": n_iter,
    }


def logistic_score(
    df: DataFrame, model: dict, out: str = "quality_prob"
) -> DataFrame:
    """Apply a fitted model: sigmoid(w·x) as one projection column."""
    features = list(model["weights"])
    w = np.array(
        [model["intercept"]] + [model["weights"][f] for f in features]
    )
    return df.withColumn(out, _sigmoid_col(_dot(features, w)))


score = logistic_score


def train_logistic_py(
    X: np.ndarray,
    y: np.ndarray,
    iterations: int = 12,
    l2: float = 1e-6,
    tol: float = 1e-10,
) -> np.ndarray:
    """Pure-numpy IRLS of the identical algorithm (the test oracle; kept
    here so the replay and the distributed path share one definition of
    the iteration)."""
    n, k = X.shape
    Xb = np.hstack([np.ones((n, 1)), X])
    w = np.zeros(k + 1)
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-Xb @ w))
        g = Xb.T @ (p - y)
        H = (Xb * (p * (1 - p))[:, None]).T @ Xb
        g[1:] += l2 * w[1:]
        H[1:, 1:] += l2 * np.eye(k)
        step = np.linalg.solve(H, g)
        w = w - step
        if float(np.max(np.abs(step))) < tol:
            break
    return w
