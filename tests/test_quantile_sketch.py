"""Error-bound and merge tests for the mergeable quantile sketch
(operators/quantile_sketch.py — Trino qdigest/tdigest workflow)."""

import pytest
from pyspark.sql import functions as F

from trino_spark.operators import quantile_sketch as qs


@pytest.fixture(scope="module")
def prices(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderpriority").alias("grp"), F.col("o_totalprice").alias("price"))
    )
    df.cache().count()
    yield df
    df.unpersist()


def test_relative_error_bound(spark, prices):
    sk = qs.qsketch_agg(prices, ["grp"], "price")
    est = {
        r.grp: r.p
        for r in sk.select("grp", qs.value_at_quantile("qsketch", 0.5).alias("p")).collect()
    }
    exact = {
        r.grp: r.p
        for r in prices.groupBy("grp")
        .agg(F.expr("percentile(price, 0.5)").alias("p"))
        .collect()
    }
    for g, e in exact.items():
        rel = abs(est[g] - e) / e
        # bucket width is ln(1+2*eps); midpoint estimate stays within ~2*eps
        # of a value whose rank is exactly q among bucketed points
        assert rel < 4 * qs.DEFAULT_EPS, (g, est[g], e)


def test_merge_equals_direct(spark, prices):
    # sketch(union) == merge(per-group sketches), bucket-for-bucket
    per = qs.qsketch_agg(prices, ["grp"], "price")
    merged = qs.qsketch_merge(
        per.select(F.lit(1).alias("one"), "qsketch"), ["one"]
    ).select("qsketch")
    direct = qs.qsketch_agg(prices.select(F.lit(1).alias("one"), "price"), ["one"], "price").select(
        "qsketch"
    )
    m = merged.collect()[0].qsketch
    d = direct.collect()[0].qsketch
    assert m == d


def test_quantile_monotone_and_extremes(spark, prices):
    sk = qs.qsketch_agg(prices.select(F.lit(1).alias("one"), "price"), ["one"], "price")
    row = sk.select(
        qs.value_at_quantile("qsketch", 0.1).alias("p10"),
        qs.value_at_quantile("qsketch", 0.5).alias("p50"),
        qs.value_at_quantile("qsketch", 0.99).alias("p99"),
    ).collect()[0]
    assert row.p10 <= row.p50 <= row.p99
    lo, hi = prices.agg(F.min("price"), F.max("price")).collect()[0]
    assert row.p10 >= lo * (1 - 5 * qs.DEFAULT_EPS)
    assert row.p99 <= hi * (1 + 5 * qs.DEFAULT_EPS)


def test_nonpositive_values_bucket(spark):
    df = spark.createDataFrame([(1, 0.0), (1, -5.0), (1, 10.0)], "g int, v double")
    sk = qs.qsketch_agg(df, ["g"], "v")
    # q=0.3 lands in the non-positive bucket -> reported as 0.0
    row = sk.select(qs.value_at_quantile("qsketch", 0.3).alias("p")).collect()[0]
    assert row.p == 0.0


def test_merge_maps_equals_explode_merge(spark, prices):
    per = qs.qsketch_agg(prices, ["grp"], "price")
    one = per.select(F.lit(1).alias("one"), "qsketch")
    m_fold = qs.qsketch_merge_maps(one, ["one"]).select("qsketch").collect()[0].qsketch
    m_explode = qs.qsketch_merge(one, ["one"]).select("qsketch").collect()[0].qsketch
    assert m_fold == m_explode


def test_values_at_quantiles_matches_single(spark, prices):
    sk = qs.qsketch_agg(prices.select(F.lit(1).alias("one"), "price"), ["one"], "price")
    row = sk.select(
        qs.values_at_quantiles("qsketch", [0.1, 0.5, 0.99]).alias("arr"),
        qs.value_at_quantile("qsketch", 0.1).alias("p10"),
        qs.value_at_quantile("qsketch", 0.5).alias("p50"),
        qs.value_at_quantile("qsketch", 0.99).alias("p99"),
    ).collect()[0]
    assert row.arr == [row.p10, row.p50, row.p99]
