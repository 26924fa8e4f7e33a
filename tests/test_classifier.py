"""Trained-classifier quality scoring: convergence on margin-separated
data, partition-order determinism of the decimal gradient sums, and the
pure-expression scoring contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.classifier import (
    predict_logistic,
    train_logistic,
)


def _planted(spark, n=200):
    # Margin-separated 1-D task + a constant-ish nuisance feature.
    rows = []
    for i in range(n):
        u = (i * 2654435761 % 1000) / 1000.0
        x = 0.6 * u - 0.5 if u < 0.5 else 0.6 * (u - 0.5) + 0.2
        rows.append((i, x, (i * 7 % 10) / 10.0, 1 if u >= 0.5 else 0))
    return spark.createDataFrame(rows, ["id", "x", "noise", "label"])


def test_train_separates_planted_margin(spark):
    df = _planted(spark)
    w = train_logistic(df, ["x", "noise"], "label", n_iter=20, lr=4.0)
    scored = predict_logistic(df, w, ["x", "noise"])
    wrong = scored.filter(
        ((F.col("score") >= 0.5).cast("int") != F.col("label"))
    ).count()
    assert wrong == 0
    assert w[1] > 0  # separating direction found, positive on x


def test_training_is_partition_order_invariant(spark):
    df = _planted(spark)
    w1 = train_logistic(df, ["x", "noise"], "label", n_iter=8, lr=2.0)
    w2 = train_logistic(
        df.repartition(13), ["x", "noise"], "label", n_iter=8, lr=2.0
    )
    w3 = train_logistic(
        df.repartition(1), ["x", "noise"], "label", n_iter=8, lr=2.0
    )
    assert w1 == w2 == w3  # exact equality — decimal sums, not approx


def test_predict_is_sigmoid_of_margin(spark):
    df = spark.createDataFrame([(1, 2.0), (2, -1.0)], ["id", "x"])
    w = [0.5, 1.5]  # bias, weight
    got = {
        r["id"]: r["score"]
        for r in predict_logistic(df, w, ["x"]).collect()
    }
    assert got[1] == pytest.approx(1.0 / (1.0 + math.exp(-(0.5 + 3.0))))
    assert got[2] == pytest.approx(1.0 / (1.0 + math.exp(-(0.5 - 1.5))))


def test_empty_training_frame_raises(spark):
    df = spark.createDataFrame([], "id long, x double, label int")
    with pytest.raises(ValueError, match="empty"):
        train_logistic(df, ["x"], "label")
