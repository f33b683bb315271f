"""Unit tests for the IPv4, TIME-of-day, and statistical scalar families
(oracle-backed corpus entries: func_ip_ops, func_time_of_day,
func_stats_cdf)."""

import math

from pyspark.sql import functions as F

from trino_spark.functions import ip as ts_ip
from trino_spark.functions import stats as st
from trino_spark.functions import timeofday as tod


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_ipv4_roundtrip_and_prefix(spark):
    assert _one(spark, ts_ip.ipv4_to_long(F.lit("1.2.3.4"))) == 16909060
    assert _one(spark, ts_ip.long_to_ipv4(F.lit(16909060))) == "1.2.3.4"
    assert _one(spark, ts_ip.ip_prefix(F.lit("192.168.13.7"), 22)) == "192.168.12.0/22"
    assert _one(spark, ts_ip.ip_subnet_min(F.lit("10.5.9.200"), 24)) == "10.5.9.0"
    assert _one(spark, ts_ip.ip_subnet_max(F.lit("10.5.9.200"), 24)) == "10.5.9.255"


def test_is_private_ip(spark):
    cases = {
        "10.1.2.3": True,
        "172.16.0.1": True,
        "172.32.0.1": False,
        "192.168.255.255": True,
        "127.0.0.1": True,
        "8.8.8.8": False,
    }
    for addr, want in cases.items():
        assert _one(spark, ts_ip.is_private_ip(F.lit(addr))) is want, addr


def test_time_parse_format_roundtrip(spark):
    nanos = 13 * tod.NANOS_PER_HOUR + 45 * tod.NANOS_PER_MINUTE + 7 * tod.NANOS_PER_SECOND + 125_000_000
    assert _one(spark, tod.parse_time(F.lit("13:45:07.125"))) == nanos
    assert _one(spark, tod.format_time(F.lit(nanos), 3)) == "13:45:07.125"
    assert _one(spark, tod.format_time(F.lit(nanos), 0)) == "13:45:07"
    # no-fraction parse
    assert _one(spark, tod.parse_time(F.lit("00:00:59"))) == 59 * tod.NANOS_PER_SECOND


def test_time_add_wraps_midnight(spark):
    late = tod.parse_time(F.lit("23:30:00"))
    assert _one(spark, tod.format_time(tod.time_add(late, 3600 * tod.NANOS_PER_SECOND), 0)) == "00:30:00"
    early = tod.parse_time(F.lit("00:10:00"))
    assert _one(spark, tod.format_time(tod.time_add(early, -20 * 60 * tod.NANOS_PER_SECOND), 0)) == "23:50:00"


def test_normal_cdf_matches_libm(spark):
    xs = [x / 7.0 for x in range(-21, 22)]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select("x", st.normal_cdf(0.0, 1.0, "x").alias("c")).collect()
    for r in rows:
        exact = 0.5 * (1 + math.erf(r.x / math.sqrt(2)))
        assert abs(r.c - exact) < 2e-7


def test_inverse_normal_cdf_inverts(spark):
    ps = [0.001, 0.01, 0.2, 0.5, 0.8, 0.99, 0.999]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    rows = df.select(
        "p", st.normal_cdf(0.0, 1.0, st.inverse_normal_cdf(0.0, 1.0, F.col("p"))).alias("rt")
    ).collect()
    for r in rows:
        assert abs(r.rt - r.p) < 1e-5, (r.p, r.rt)


def test_wilson_interval_known_value(spark):
    # 40/100 successes at z=1.96: classic textbook interval (.3094, .4980)
    df = spark.createDataFrame([(40.0, 100.0)], "s double, n double")
    row = df.select(
        st.wilson_interval_lower("s", "n", 1.96).alias("lo"),
        st.wilson_interval_upper("s", "n", 1.96).alias("hi"),
    ).collect()[0]
    assert abs(row.lo - 0.309338) < 1e-4
    assert abs(row.hi - 0.498017) < 1e-4
