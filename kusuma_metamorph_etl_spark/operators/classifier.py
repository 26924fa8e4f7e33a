"""Distributed trained-classifier quality scoring.

The modern crawl-curation stack filters by a TRAINED model score, not
only hand rules: CCNet's fastText language/quality models, the LLaMA
"Wikipedia-reference" classifier, and FineWeb-Edu's educational-quality
scorer are all "train a small classifier on cheap features / weak
labels, score every document, threshold".  The reference pipeline
(`/root/reference/ETL-Airflow/dags/tasks/transform_utils.py`) has no
model stage at all — this module is [EXT] north-star surface beside the
rule-based `text.quality_features` / `text.gopher_filter` and the
importance-weighting half in `sampling.dsir_log_weights`.

Spark-first shape: batch gradient descent where each iteration is ONE
map-side-combinable aggregation over a cached narrow feature frame —
``k+1`` sums per pass, one reduce stage, no per-row Python.  At 100 TB
the feature frame is (label, k doubles) per doc: the scan is the cost,
the aggregation tree is ~free, and iterations are a fixed constant.

Determinism contract (the property every oracle check here leans on):
per-row gradient terms are truncated to DECIMAL(38,18) before summing,
so the sum is EXACT and partition/order-independent — float
accumulation order can never perturb the learned weights (same
discipline as the exact-decimal money sums in ``functions/numeric.py``;
the 7-core partition-invariance sweep exercises it for real).  Weight
updates happen driver-side in float64 on the k+1 exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 18 fractional digits: gradient terms are products of sigmoids and
# bounded features (|x| <= ~10 here), so 20 integer digits of headroom
# leaves truncation as the only loss — identical for every row
# regardless of partitioning.
_GRAD_DECIMAL = "decimal(38,18)"


def _margin(weights: list[float], feature_cols: list[str]):
    m = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        m = m + F.lit(float(w)) * F.col(c)
    return m


def train_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_iter: int = 20,
    lr: float = 2.0,
) -> list[float]:
    """Batch-GD logistic regression → ``[bias, w_1..w_k]``.

    ``label_col`` is 0/1; features should be roughly unit-scaled (the
    callers here feed ratios in [0,1] and counts divided by a cap —
    there is deliberately NO hidden standardization pass, so the learned
    weights mean what the caller's features mean).  One aggregation job
    per iteration; gradient sums are exact decimals (module docstring),
    so the returned weights are a pure function of the multiset of rows.
    """
    feats = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    ).persist()
    try:
        # n rides the FIRST gradient pass instead of a separate count()
        # job (r19 §1.2: n_iter+1 sequential driver round-trips → n_iter;
        # the weight update consumes n only after that first row
        # returns).  The count is exact and identical either way.
        n: int | None = None
        weights = [0.0] * (len(feature_cols) + 1)
        for _ in range(n_iter):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(weights, feature_cols)))
            err = p - F.col("__y")
            grads = [F.sum(err.cast(_GRAD_DECIMAL)).alias("g0")] + [
                F.sum((err * F.col(c)).cast(_GRAD_DECIMAL)).alias(f"g{i + 1}")
                for i, c in enumerate(feature_cols)
            ]
            if n is None:
                grads.append(F.count(F.lit(1)).alias("__n"))
            row = feats.agg(*grads).first()
            if n is None:
                n = int(row["__n"])
                if n == 0:
                    raise ValueError("train_logistic: empty training frame")
            weights = [
                w - lr / n * float(row[i]) for i, w in enumerate(weights)
            ]
        # n_iter == 0 runs no gradient pass; keep the empty-frame error
        # contract with an explicit count in that (degenerate) case.
        if n is None and feats.count() == 0:
            raise ValueError("train_logistic: empty training frame")
    finally:
        feats.unpersist()
    return weights


def predict_logistic(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    score_col: str = "score",
) -> DataFrame:
    """Attach the model's sigmoid score — a pure column expression, so
    scoring 100 TB is a scan with no shuffle and no Python boundary."""
    m = _margin(weights, feature_cols)
    return df.withColumn(score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-m)))
