"""ML functions — learn_classifier / classify / learn_regressor / regress.

Reference: plugin/trino-ml/src/main/java/io/trino/plugin/ml/
LearnClassifierAggregation.java, ClassifyFunction.java,
LearnRegressorAggregation.java, RegressFunction.java, FeaturesFunctions
(the `features(...)` constructor). Trino trains libsvm SVMs inside an
aggregation and applies them with scalar functions; we keep the same
surface shape with Spark-idiomatic internals:

- the MODEL is a plain coefficient array (struct<weights, bias>), a
  broadcastable value like Trino's serialized model slice;
- training is distributed batch gradient descent where EVERY iteration is
  ONE hash aggregation: the gradient is a sum of per-row expression
  vectors (aggregate over zip_with products — all codegen), so a 100 TB
  training set streams through map-side partial sums, never collecting
  rows. The driver only accumulates the (dim+1)-float gradient per round;
- classify/regress are pure expressions (dot product via zip_with fold).

Logistic regression (classifier) / linear least squares (regressor)
instead of libsvm SVM — documented deviation: same API role, scalable
formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def features(*cols: Column | str) -> Column:
    """features(x1, x2, ...) -> array<double> (trino-ml FeaturesFunctions)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.array(*[c.cast("double") for c in cs])


def _dot(vec: Column, weights: list[float]) -> Column:
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec, w, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v
    )


def _margin(vec: Column, weights: list[float], bias: float) -> Column:
    return _dot(vec, weights) + F.lit(float(bias))


def classify(vec: Column | str, model: dict) -> Column:
    """Predicted label in {0, 1} (ClassifyFunction.java role)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return (_margin(v, model["weights"], model["bias"]) > 0).cast("int")


def classify_proba(vec: Column | str, model: dict) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    m = _margin(v, model["weights"], model["bias"])
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-m))


def regress(vec: Column | str, model: dict) -> Column:
    """Predicted value (RegressFunction.java role)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return _margin(v, model["weights"], model["bias"])


def _grad_agg(df: DataFrame, label: str, vec: str, weights, bias, kind: str, dim: int):
    """One distributed gradient step: sum of per-row residual * feature
    vectors, computed as dim+1 plain agg expressions (codegen, map-side
    partial sums)."""
    v = F.col(vec)
    m = _margin(v, weights, bias)
    if kind == "logistic":
        pred = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    else:
        pred = m
    resid = pred - F.col(label).cast("double")
    aggs = [F.sum(resid * F.element_at(v, i + 1)).alias(f"g{i}") for i in range(dim)]
    aggs.append(F.sum(resid).alias("gb"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return df.agg(*aggs).first()


def _learn(
    df: DataFrame, label: str, vec: str, kind: str, iters: int, lr: float
) -> dict:
    dim = len(df.select(vec).first()[0])
    weights = [0.0] * dim
    bias = 0.0
    for _ in range(iters):
        row = _grad_agg(df, label, vec, weights, bias, kind, dim)
        n = float(row["n"])
        weights = [w - lr * float(row[f"g{i}"]) / n for i, w in enumerate(weights)]
        bias = bias - lr * float(row["gb"]) / n
    return {"weights": weights, "bias": bias, "kind": kind}


def learn_classifier(
    df: DataFrame, label: str = "label", vec: str = "features",
    iters: int = 60, lr: float = 1.0,
) -> dict:
    """Binary classifier from (label in {0,1}, features array<double>)
    (LearnClassifierAggregation.java role). Each iteration is one
    aggregation over the full data — no row ever reaches the driver."""
    return _learn(df, label, vec, "logistic", iters, lr)


def learn_regressor(
    df: DataFrame, label: str = "label", vec: str = "features",
    iters: int = 120, lr: float = 0.1,
) -> dict:
    """Least-squares regressor (LearnRegressorAggregation.java role)."""
    return _learn(df, label, vec, "linear", iters, lr)
