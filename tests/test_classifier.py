"""Distributed IRLS logistic regression vs its numpy replay, plus the
quality-filter end-to-end shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions.classifier import (
    logistic_score,
    train_logistic,
    train_logistic_py,
)
from arkouda_njit_spark.functions import quality_score


def _toy(spark, n=400, seed=3):
    """Deterministic 3-feature binary problem with known structure."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    logits = 1.5 * X[:, 0] - 2.0 * X[:, 1] + 0.5 * X[:, 2] - 0.3
    y = (1.0 / (1.0 + np.exp(-logits)) > rng.uniform(size=n)).astype(float)
    rows = [
        (float(a), float(b), float(c), float(lbl))
        for (a, b, c), lbl in zip(X, y)
    ]
    df = spark.createDataFrame(
        rows, "f1 double, f2 double, f3 double, label double"
    )
    return df.repartition(7), X, y


def test_weights_match_numpy_irls(spark):
    df, X, y = _toy(spark)
    model = train_logistic(df, ["f1", "f2", "f3"])
    w = train_logistic_py(X, y)
    assert model["intercept"] == pytest.approx(w[0], abs=1e-8)
    for i, f in enumerate(["f1", "f2", "f3"]):
        assert model["weights"][f] == pytest.approx(w[i + 1], abs=1e-8)
    # the fitted signs recover the generating structure
    assert model["weights"]["f1"] > 0 > model["weights"]["f2"]


def test_scores_and_accuracy(spark):
    df, X, y = _toy(spark)
    model = train_logistic(df, ["f1", "f2", "f3"])
    scored = logistic_score(df, model)
    acc = (
        scored.select(
            ((F.col("quality_prob") > 0.5).cast("double") == F.col("label"))
            .cast("double")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc > 0.75  # labels are Bernoulli draws: Bayes-limited
    probs = scored.select(F.min("quality_prob"), F.max("quality_prob")).collect()[0]
    assert 0.0 <= probs[0] and probs[1] <= 1.0


def test_partitioning_invariance(spark):
    df, _, _ = _toy(spark)
    m1 = train_logistic(df.repartition(1), ["f1", "f2", "f3"])
    m2 = train_logistic(df.repartition(13), ["f1", "f2", "f3"])
    for f in ["f1", "f2", "f3"]:
        assert m1["weights"][f] == pytest.approx(m2["weights"][f], abs=1e-7)


def test_validation(spark):
    df, _, _ = _toy(spark, n=20)
    with pytest.raises(ValueError, match="at least one"):
        train_logistic(df, [])
    with pytest.raises(ValueError, match="MAX_FEATURES"):
        train_logistic(df, [f"f{i}" for i in range(100)])


def test_quality_filter_end_to_end(spark):
    """CCNet-shape: heuristic features -> learned filter over documents."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    feats = quality_score(docs)  # adds `quality` heuristic in [0,1]
    labeled = feats.withColumn(
        "n_chars_n", F.least(F.col("n_chars") / 5000.0, F.lit(1.0))
    ).withColumn(
        "label", (F.col("quality") > 0.5).cast("double")
    )
    model = train_logistic(labeled, ["quality", "n_chars_n"], "label")
    scored = logistic_score(labeled, model)
    # a classifier trained to reproduce its own feature threshold must
    # order documents consistently with it
    agree = (
        scored.select(
            (
                (F.col("quality_prob") > 0.5) == (F.col("label") == 1.0)
            ).cast("double").alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert agree > 0.95
