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


class TestTimeWithTimeZone:
    """TIME WITH TIME ZONE (TimeWithTimeZoneType.java) — round-5 closure
    of the documented type gap: canonical-varchar SQL carrier
    (functions/registry.py r5 batch) + codegen struct Column API
    (functions/timeofday.py)."""

    def test_literal_and_cast(self, spark):
        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        r = eng.sql(
            "SELECT TIME '10:30:00+05:30' AS a,"
            " CAST('23:59:59.5-08:00' AS TIME WITH TIME ZONE) AS b,"
            " TIME '10:30:00' AS plain"
        ).collect()[0]
        assert r.a == "10:30:00.000+05:30"
        assert r.b == "23:59:59.500-08:00"
        import datetime

        assert r.plain == datetime.time(10, 30)  # Spark-native time(6)

    def test_utc_normalization_and_at_time_zone(self, spark):
        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        r = eng.sql(
            "SELECT timetz_to_utc_nanos(TIME '10:30:00+05:30') AS u1,"
            " timetz_to_utc_nanos(TIME '05:00:00+00:00') AS u2,"
            " TIME '10:30:00+05:30' AT TIME ZONE '-08:00' AS shifted,"
            " timetz_hour(TIME '23:45:10.5-03:30') AS h,"
            " timetz_offset_minutes(TIME '23:45:10.5-03:30') AS o"
        ).collect()[0]
        assert r.u1 == r.u2 == 5 * 3600 * 10**9  # same instant
        assert r.shifted == "21:00:00.000-08:00"  # wraps to previous day
        assert r.h == 23 and r.o == -210

    def test_offset_range_enforced(self, spark):
        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        import pytest as _pytest

        with _pytest.raises(Exception, match="[Oo]ffset|[Ii]nvalid"):
            eng.sql("SELECT timetz('10:00:00+15:00')").collect()
        # round-6 (ADVICE): minute field > 59 is an invalid offset, not
        # carry into hours ('+10:99' must not parse as +699 minutes)
        with _pytest.raises(Exception, match="[Oo]ffset|[Ii]nvalid"):
            eng.sql("SELECT timetz('10:30:00+10:99')").collect()
        with _pytest.raises(Exception, match="[Oo]ffset|[Ii]nvalid|minutes"):
            eng.sql(
                "SELECT TIME '08:00:00+01:00' AT TIME ZONE '+02:75'"
            ).collect()

    def test_precision_form_time_p_with_time_zone(self, spark):
        """Round-6 (ADVICE): Trino's canonical spelling TIME(3) WITH TIME
        ZONE — both the CAST rewriter and the DDL type mapper must accept
        the parenthesized precision."""
        import os

        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        r = eng.sql(
            "SELECT CAST('07:15:30.25+02:00' AS TIME(3) WITH TIME ZONE) AS a,"
            " TRY_CAST('nonsense' AS TIME(6) WITH TIME ZONE) AS b"
        ).collect()[0]
        assert r.a == "07:15:30.250+02:00"
        assert r.b is None
        tbl = f"tzprec_{os.getpid()}"
        eng.sql(f"DROP TABLE IF EXISTS {tbl}")
        eng.sql(f"CREATE TABLE {tbl} (k BIGINT, tv TIME(3) WITH TIME ZONE)")
        eng.sql(f"INSERT INTO {tbl} VALUES (CAST(1 AS BIGINT), TIME '10:30:00+05:30')")
        rows = eng.sql(f"SELECT k, tv FROM {tbl}").collect()
        assert [(r.k, r.tv) for r in rows] == [(1, "10:30:00.000+05:30")]
        eng.sql(f"DROP TABLE {tbl}")

    def test_column_api_struct_roundtrip(self, spark):
        from trino_spark.functions import timeofday as T

        df = spark.createDataFrame(
            [("10:30:00.123+05:30",), ("00:15-14:00",)], "s: string"
        )
        rows = df.select(
            T.format_timetz(T.parse_timetz("s")).alias("canon"),
            T.timetz_utc_nanos(T.parse_timetz("s")).alias("u"),
            T.format_timetz(T.timetz_at_offset(T.parse_timetz("s"), 345)).alias("ktm"),
        ).collect()
        assert rows[0].canon == "10:30:00.123+05:30"
        assert rows[0].u == 5 * 3600 * 10**9 + 123_000_000
        assert rows[0].ktm == "10:45:00.123+05:45"
        assert rows[1].canon == "00:15:00.000-14:00"

    def test_timetz_column_ddl_lifecycle(self, spark):
        """TIME WITH TIME ZONE as a DDL column type (varchar carrier) +
        folded literals inside VALUES (a UDF call would be illegal in an
        inline table — the dialect constant-folds the literal instead).
        Also covers the drop-last-table infoschema refresh edge."""
        import os

        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        tbl = f"tztest_{os.getpid()}"
        eng.sql(f"DROP TABLE IF EXISTS {tbl}")
        eng.sql(f"CREATE TABLE {tbl} (k BIGINT, tv TIME WITH TIME ZONE)")
        eng.sql(
            f"INSERT INTO {tbl} VALUES (CAST(1 AS BIGINT), TIME '10:30:00+05:30'),"
            " (CAST(2 AS BIGINT), TIME '23:59:59-08:00')"
        )
        rows = eng.sql(
            f"SELECT k, tv, timetz_to_utc_nanos(tv) AS u FROM {tbl} ORDER BY k"
        ).collect()
        assert [(r.k, r.tv) for r in rows] == [
            (1, "10:30:00.000+05:30"),
            (2, "23:59:59.000-08:00"),
        ]
        assert rows[0].u == 5 * 3600 * 10**9
        eng.sql(f"DROP TABLE {tbl}")
