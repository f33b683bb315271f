"""Pin formatting/parsing scalars to the reference's documented examples
(functions/formatting.py — DateTimeFunctions.java:732 parse_duration,
DataSizeFunctions.java:41 parse_data_size, FormatNumberFunction.java:60
format_number, timestamp/HumanReadableSeconds.java:35)."""

import pytest
from pyspark.sql import functions as F

from trino_spark.functions import formatting as fm


def _one(spark, col, value, typ):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(col("v").alias("r")).collect()[0].r


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("42.8ms", 43),
        ("3.81 d", 329184000),
        ("5m", 300000),
        ("1.5h", 5400000),
        ("100ns", 0),
        ("7us", 0),
        ("12 s", 12000),
    ],
)
def test_parse_duration(spark, inp, expected):
    assert _one(spark, fm.parse_duration, inp, "string") == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("2.3MB", 2411724),
        ("1.2kB", 1228),
        ("0B", 0),
        ("1GB", 1073741824),
        ("1.5TB", 1649267441664),
    ],
)
def test_parse_data_size(spark, inp, expected):
    assert int(_one(spark, fm.parse_data_size, inp, "string")) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        (123456, "123K"),
        (1000000, "1M"),
        (12345678, "12.3M"),
        (999, "999"),
        (0, "0"),
        (-123456, "-123.46K"),  # reference quirk: negatives keep 2 decimals
        (1234, "1.23K"),
        (999999, "1000K"),
        (1500000000000000000, "1500Q"),
    ],
)
def test_format_number(spark, inp, expected):
    assert _one(spark, fm.format_number, inp, "long") == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        (96.0, "1 minute, 36 seconds"),
        (3762.0, "1 hour, 2 minutes, 42 seconds"),
        (56363463.0, "93 weeks, 1 day, 8 hours, 31 minutes, 3 seconds"),
        (0.0, "0 seconds"),
        (-1.7, "2 seconds"),
        (604800.0, "1 week"),
        (61.0, "1 minute, 1 second"),
    ],
)
def test_human_readable_seconds(spark, inp, expected):
    assert _one(spark, fm.human_readable_seconds, inp, "double") == expected
