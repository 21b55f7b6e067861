"""Distributed logistic regression (functions/classifier.py): gradient
descent matched against an exact numpy replica, separable data learned
to high accuracy, and the end-to-end text-quality path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from eel_sdk_spark.functions import classifier as C


def _numpy_logreg(X, y, lr=1.0, iters=50, l2=0.0):
    """Exact replica of train_logreg's update rule (standardized
    features, base-rate bias init, full-batch GD)."""
    means, stds = X.mean(axis=0), X.std(axis=0)
    stds = np.where(stds < 1e-12, 1.0, stds)
    Xs = (X - means) / stds
    w = np.zeros(X.shape[1])
    eps = 1e-12
    b = float(np.log((y.mean() + eps) / (1 - y.mean() + eps)))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        r = p - y
        gw = (Xs * r[:, None]).mean(axis=0) + l2 * w
        gb = r.mean()
        w -= lr * gw
        b -= lr * gb
    return w, b, means, stds


def test_train_logreg_matches_numpy_replica(spark):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((2000, 3)) * [1.0, 10.0, 0.1]  # mixed scales
    true_w = np.array([2.0, -0.3, 8.0])
    y = (1.0 / (1.0 + np.exp(-(X @ true_w)))
         > rng.random(2000)).astype(float)
    rows = [(float(a), float(b_), float(c), float(t))
            for (a, b_, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, "
                                     "y double")
    model = C.train_logreg(df, ["x1", "x2", "x3"], "y",
                           lr=1.0, max_iter=50, tol=0.0)
    w_np, b_np, _, _ = _numpy_logreg(X, y, lr=1.0, iters=50)
    assert np.allclose(model["w"], w_np, atol=1e-6), (model["w"], w_np)
    assert abs(model["b"] - b_np) < 1e-6

    # scoring expression reproduces the numpy probabilities
    scored = df.withColumn("p", C.logreg_score(model)).collect()
    means, stds = np.asarray(model["means"]), np.asarray(model["stds"])
    for r in scored[:50]:
        x = (np.array([r["x1"], r["x2"], r["x3"]]) - means) / stds
        p = 1.0 / (1.0 + np.exp(-(x @ np.asarray(model["w"])
                                  + model["b"])))
        assert abs(r["p"] - p) < 1e-9


def test_separable_data_learned_and_l2_shrinks(spark):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((1500, 2))
    y = (X[:, 0] + X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b_), float(t)) for (a, b_), t in zip(X, y)],
        "x1 double, x2 double, y double")
    model = C.train_logreg(df, ["x1", "x2"], "y", lr=2.0, max_iter=120)
    acc = (df.withColumn("p", C.logreg_score(model))
           .filter((F.col("p") > 0.5) == (F.col("y") > 0.5)).count()
           / 1500)
    assert acc > 0.97, acc
    ridge = C.train_logreg(df, ["x1", "x2"], "y", lr=2.0, max_iter=120,
                           l2=0.5)
    assert (np.linalg.norm(ridge["w"]) < np.linalg.norm(model["w"]))


def test_quality_classifier_end_to_end(spark):
    """Labeled good/junk docs -> trained model separates a held-out set;
    scoring is a single Column expression over raw text."""
    rng = np.random.default_rng(7)
    words = ["the", "of", "analysis", "shows", "results", "in", "a",
             "measured", "pipeline", "data", "this", "is", "and", "to"]

    def good(i):
        return " ".join(rng.choice(words, size=60)) + f" doc {i}."

    def junk(i):
        tok = f"BUY#{i}!!"
        return " ".join([tok] * 40) + " !!! $$$ ###"

    train = [(good(i), 1.0) for i in range(150)] + \
            [(junk(i), 0.0) for i in range(150)]
    test = [(good(1000 + i), 1.0) for i in range(40)] + \
           [(junk(1000 + i), 0.0) for i in range(40)]
    tr = spark.createDataFrame(train, "text string, y double")
    te = spark.createDataFrame(test, "text string, y double")
    model = C.train_quality_classifier(tr, "text", "y", lr=1.0,
                                       max_iter=80)
    acc = (te.withColumn("p", C.score_quality(model, F.col("text")))
           .filter((F.col("p") > 0.5) == (F.col("y") > 0.5)).count()
           / len(test))
    assert acc >= 0.95, acc
    # determinism: retraining yields identical weights (no RNG anywhere)
    again = C.train_quality_classifier(tr, "text", "y", lr=1.0,
                                       max_iter=80)
    assert again["w"] == model["w"] and again["b"] == model["b"]
