"""trino-ml surface tests: learn_classifier/classify on separable data,
learn_regressor against the known generating line, features()."""

from pyspark.sql import functions as F

from trino_spark.operators import ml


def _labeled(spark, n=2000):
    # label = 1 iff 2*x1 - x2 > 0.5 (deterministic, separable-ish)
    return spark.range(n).select(
        ((F.xxhash64("id") % 1000) / 500.0 - 1.0).alias("x1"),
        ((F.xxhash64(F.col("id") + 7) % 1000) / 500.0 - 1.0).alias("x2"),
    ).select(
        ml.features("x1", "x2").alias("features"),
        (2.0 * F.col("x1") - F.col("x2") > 0.5).cast("int").alias("label"),
    )


def test_classifier_accuracy(spark):
    df = _labeled(spark)
    model = ml.learn_classifier(df, iters=80, lr=2.0)
    acc = (
        df.withColumn("pred", ml.classify("features", model))
        .agg(F.avg((F.col("pred") == F.col("label")).cast("double")))
        .first()[0]
    )
    assert acc >= 0.95, acc


def test_classifier_proba_monotone(spark):
    df = _labeled(spark)
    model = ml.learn_classifier(df, iters=60, lr=2.0)
    rows = df.select(
        "label", ml.classify_proba("features", model).alias("p")
    ).collect()
    avg1 = sum(r.p for r in rows if r.label == 1) / sum(1 for r in rows if r.label == 1)
    avg0 = sum(r.p for r in rows if r.label == 0) / sum(1 for r in rows if r.label == 0)
    assert avg1 > 0.7 > 0.3 > avg0


def test_regressor_recovers_line(spark):
    # y = 3*x1 - 2*x2 + 1 exactly; GD must recover the coefficients
    df = spark.range(1000).select(
        ((F.col("id") % 100) / 50.0 - 1.0).alias("x1"),
        (((F.col("id") * 7) % 100) / 50.0 - 1.0).alias("x2"),
    ).select(
        ml.features("x1", "x2").alias("features"),
        (3.0 * F.col("x1") - 2.0 * F.col("x2") + 1.0).alias("label"),
    )
    model = ml.learn_regressor(df, iters=180, lr=0.5)
    w1, w2 = model["weights"]
    assert abs(w1 - 3) < 0.05 and abs(w2 + 2) < 0.05 and abs(model["bias"] - 1) < 0.05
    err = (
        df.withColumn("pred", ml.regress("features", model))
        .agg(F.avg(F.abs(F.col("pred") - F.col("label"))))
        .first()[0]
    )
    assert err < 0.05
