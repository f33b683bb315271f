"""Unit tests for the Trino-parity expression library (no oracle — direct
expected-value assertions, mirroring Trino's scalar function tests in
core/trino-main/src/test/java/io/trino/operator/scalar/)."""

from pyspark.sql import functions as F

from trino_spark.functions import arrays as arr
from trino_spark.functions import datetimes as dtf
from trino_spark.functions import strings as st
from trino_spark.functions import vectors as vec


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_hamming_distance(spark):
    assert _one(spark, st.hamming_distance(F.lit("karolin"), F.lit("kathrin"))) == 3
    assert _one(spark, st.hamming_distance(F.lit("abc"), F.lit("abc"))) == 0
    assert _one(spark, st.hamming_distance(F.lit("ab"), F.lit("abc"))) is None


def test_strpos_instance(spark):
    assert _one(spark, st.strpos(F.lit("a-b-c-d"), "-", 1)) == 2
    assert _one(spark, st.strpos(F.lit("a-b-c-d"), "-", 3)) == 6
    assert _one(spark, st.strpos(F.lit("a-b"), "-", 3)) == 0


def test_normalize_text(spark):
    assert _one(spark, st.normalize_text(F.lit("  Hello,   WORLD!  "))) == "hello world"


def test_ngrams(spark):
    got = _one(spark, arr.ngrams(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)), 2))
    assert got == [[1, 2], [2, 3], [3, 4]]
    got1 = _one(spark, arr.word_ngrams(F.lit("a b c"), 2))
    assert got1 == ["a b", "b c"]


def test_char_shingles(spark):
    assert _one(spark, arr.char_shingles(F.lit("abcd"), 3)) == ["abc", "bcd"]


def test_combinations_2(spark):
    got = _one(spark, arr.combinations_2(F.array(F.lit(1), F.lit(2), F.lit(3))))
    assert got == [[1, 2], [1, 3], [2, 3]]


def test_vector_ops(spark):
    a = F.array(F.lit(1.0), F.lit(2.0))
    b = F.array(F.lit(3.0), F.lit(4.0))
    assert _one(spark, vec.dot_product(a, b)) == 11.0
    assert abs(_one(spark, vec.l2_norm(b)) - 5.0) < 1e-12
    cs = _one(spark, vec.cosine_similarity(a, b))
    assert abs(cs - 0.9838699100999074) < 1e-12
    n = _one(spark, vec.vector_normalize(b))
    assert abs(n[0] - 0.6) < 1e-12 and abs(n[1] - 0.8) < 1e-12


def test_mysql_pattern_translation():
    assert dtf.mysql_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    assert dtf.mysql_to_java("%H:%i:%s") == "HH:mm:ss"
    assert dtf.mysql_to_java("%d/%b/%Y") == "dd/MMM/yyyy"


def test_date_add_diff(spark):
    ts = F.lit("2024-01-31 10:00:00").cast("timestamp")
    assert str(_one(spark, dtf.date_add("month", 1, ts))) == "2024-02-29 10:00:00"
    assert _one(spark, dtf.date_diff("day", ts, F.lit("2024-02-02 09:00:00").cast("timestamp"))) == 1
    assert _one(spark, dtf.date_diff("hour", ts, F.lit("2024-01-31 13:30:00").cast("timestamp"))) == 3
    assert _one(spark, dtf.format_datetime(ts, "%Y-%m-%d")) == "2024-01-31"
