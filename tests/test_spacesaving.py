"""SpaceSaving heavy-hitters sketch (operators/spacesaving.py — Trino
ApproximateMostFrequentHistogram.java): exactness when NDV <= k, error
bounds + merge-equivalence under trimming."""

import pytest
from pyspark.sql import functions as F

from trino_spark.operators import spacesaving as ss


@pytest.fixture(scope="module")
def zipf(spark):
    # value v appears (21-v)^2 times, v = 1..20 -> heavy head, long-ish tail
    rows = [(1 if v % 2 else 2, str(v)) for v in range(1, 21) for _ in range((21 - v) ** 2)]
    df = spark.createDataFrame(rows, "g int, v string")
    df.cache().count()
    yield df
    df.unpersist()


def _exact_counts(df):
    return {
        (r.g, r.v): r.n
        for r in df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_exact_when_ndv_below_k(spark, zipf):
    sk = ss.spacesaving_agg(zipf, ["g"], "v", k=32)
    rows = sk.select("g", "sketch").collect()
    exact = _exact_counts(zipf)
    for r in rows:
        assert r.sketch.err == 0
        for v, n in r.sketch.counters.items():
            assert exact[(r.g, v)] == n


def test_trimming_and_error_bound(spark, zipf):
    k = 5
    sk = ss.spacesaving_agg(zipf, ["g"], "v", k=k)
    exact = _exact_counts(zipf)
    for r in sk.select("g", "sketch").collect():
        assert len(r.sketch.counters) == k
        # stored counts are exact; err bounds any absent value's count
        for v, n in r.sketch.counters.items():
            assert exact[(r.g, v)] == n
        absent = [n for (g, v), n in exact.items() if g == r.g and v not in r.sketch.counters]
        assert r.sketch.err >= max(absent)


def test_merge_equals_direct_build(spark, zipf):
    k = 6
    per = ss.spacesaving_agg(zipf, ["g"], "v", k=k)
    merged = ss.spacesaving_merge(per.select(F.lit(1).alias("one"), "sketch"), ["one"], k=k)
    direct = ss.spacesaving_agg(zipf.select(F.lit(1).alias("one"), "v"), ["one"], "v", k=k)
    m = merged.select("sketch").collect()[0].sketch
    d = direct.select("sketch").collect()[0].sketch
    # heavy head (counts > err) must agree exactly between merged and direct
    for v, n in d.counters.items():
        if n > m.err:
            assert m.counters.get(v) is not None
    # merged counts never overcount and undercount is bounded by err
    exact = _exact_counts(zipf.select(F.lit(1).alias("g"), "v"))
    for v, n in m.counters.items():
        true_n = exact[(1, v)]
        assert n <= true_n
        assert true_n - n <= m.err


def test_top_n_string_order(spark, zipf):
    sk = ss.spacesaving_agg(zipf.select(F.lit(1).alias("one"), "v"), ["one"], "v", k=32)
    s = sk.select(ss.most_frequent_string("sketch", 3).alias("s")).collect()[0].s
    assert s == "1:400,2:361,3:324"
