"""SQL-surface parity for the round-4 scalar batch: every name here is a
documented reference function (docs/src/main/sphinx/functions/*.md) that
must resolve and evaluate through TrinoEngine.sql verbatim.

Expected values are the reference docs' own examples where given
(murmur3, parse_data_size) or closed forms.
"""

from __future__ import annotations

import pytest

from trino_spark.dialect.engine import TrinoEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return TrinoEngine(spark, sf_dir)


def _one(eng, sql):
    return eng.sql(sql).collect()[0][0]


# ---------------------------------------------------------------- binary


def test_base64url_roundtrip(eng):
    assert _one(eng, "SELECT to_base64url(x'fbff')") == "-_8="
    assert _one(eng, "SELECT to_hex(from_base64url('-_8='))") == "FBFF"


def test_big_endian(eng):
    assert _one(eng, "SELECT to_hex(to_big_endian_32(1))") == "00000001"
    assert _one(eng, "SELECT from_big_endian_32(x'FFFFFFFF')") == -1
    assert _one(eng, "SELECT to_hex(to_big_endian_64(-1))") == "FFFFFFFFFFFFFFFF"
    assert _one(eng, "SELECT from_big_endian_64(x'0000000000000100')") == 256


def test_ieee754(eng):
    assert _one(eng, "SELECT to_hex(to_ieee754_32(CAST(1.0 AS REAL)))") == "3F800000"
    assert _one(eng, "SELECT from_ieee754_32(x'3F800000')") == 1.0
    assert _one(eng, "SELECT to_hex(to_ieee754_64(1.0))") == "3FF0000000000000"
    assert _one(eng, "SELECT from_ieee754_64(x'3FF0000000000000')") == 1.0


def test_murmur3_reference_example(eng):
    # binary.md murmur3 example: ba 58 55 63 55 69 b4 2f 49 20 37 2c a0 e3 96 ef
    got = _one(eng, "SELECT to_hex(murmur3(from_base64('aaaaaa')))")
    assert got == "BA5855635569B42F4920372CA0E396EF"


# -------------------------------------------------------------- teradata


def test_char2hexint(eng):
    assert _one(eng, "SELECT char2hexint('a')") == "0061"
    assert _one(eng, "SELECT char2hexint('Hi')") == "00480069"


def test_to_char(eng):
    got = _one(eng, "SELECT to_char(timestamp '2024-01-15 13:05:07', 'YYYY-MM-DD HH24:MI:SS')")
    assert got == "2024-01-15 13:05:07"


# ------------------------------------------------------------ conversion


def test_parse_data_size(eng):
    # conversion.md examples: '1B' -> 1, '1kB' -> 1024, '2.3MB' -> 2411724
    assert int(_one(eng, "SELECT parse_data_size('1B')")) == 1
    assert int(_one(eng, "SELECT parse_data_size('1kB')")) == 1024
    assert int(_one(eng, "SELECT parse_data_size('2.3MB')")) == 2411724


# ------------------------------------------------------------------ json


def test_is_json_scalar(eng):
    assert _one(eng, "SELECT is_json_scalar('1')") is True
    assert _one(eng, "SELECT is_json_scalar('\"abc\"')") is True
    assert _one(eng, "SELECT is_json_scalar('[1, 2, 3]')") is False
    assert _one(eng, "SELECT is_json_scalar('{\"a\": 1}')") is False


# ------------------------------------------------------------------ math


def test_inverse_beta_cdf_roundtrip(eng):
    got = _one(eng, "SELECT inverse_beta_cdf(2.0, 5.0, beta_cdf(2.0, 5.0, 0.3))")
    assert abs(got - 0.3) < 1e-9


def test_t_pdf(eng):
    import math

    # t(1) is the standard Cauchy: pdf(0) = 1/pi
    assert abs(_one(eng, "SELECT t_pdf(0.0, 1)") - 1 / math.pi) < 1e-12


# ------------------------------------------------------------- datetime


def test_timezone_accessors(eng):
    assert _one(eng, "SELECT timezone(timestamp '2024-01-01 00:00:00')") == "UTC"
    assert _one(eng, "SELECT timezone_hour(timestamp '2024-01-01 00:00:00')") == 0
    assert _one(eng, "SELECT timezone_minute(timestamp '2024-01-01 00:00:00')") == 0


def test_to_milliseconds(eng):
    assert _one(eng, "SELECT to_milliseconds(interval '3' second)") == 3000
    assert _one(eng, "SELECT to_milliseconds(interval '2' day)") == 172_800_000


def test_from_iso8601_timestamp_nanos(eng):
    got = _one(eng, "SELECT from_iso8601_timestamp_nanos('2024-01-01T01:02:03.123456789Z')")
    assert got.microsecond == 123456 and got.hour == 1


# ----------------------------------------------------------------- color


def test_color_encoding(eng):
    # ColorFunctions.java: rgb packs (r<<16)|(g<<8)|b; system colors are
    # -(index+1); '#rgb' doubles each hex digit.
    assert _one(eng, "SELECT rgb(255, 0, 0)") == 0xFF0000
    assert _one(eng, "SELECT color('#f00')") == 0xFF0000
    assert _one(eng, "SELECT color('red')") == -2
    assert _one(eng, "SELECT color(0.5, rgb(0,0,0), rgb(255,255,255))") >= 0


def test_render(eng):
    assert _one(eng, "SELECT render(true)") == "\x1b[32m✓\x1b[0m"
    assert _one(eng, "SELECT render(false)") == "\x1b[31m✗\x1b[0m"
    assert _one(eng, "SELECT render(42, color('blue'))") == "\x1b[34m42\x1b[0m"


def test_bar_colored(eng):
    got = _one(eng, "SELECT bar(0.5, 10, rgb(255,0,0), rgb(0,255,0))")
    assert got.count("█") == 5 and got.endswith("\x1b[0m" + " " * 5)


# ------------------------------------------------------------ aggregates


def test_map_union(eng):
    got = _one(
        eng,
        "SELECT map_union(m) FROM (VALUES map(array[1], array['a']),"
        " map(array[1,2], array['x','b'])) t(m)",
    )
    assert got == {1: "x", 2: "b"}


def test_reduce_agg(eng):
    got = _one(
        eng,
        "SELECT reduce_agg(x, 1, (a, b) -> a * b, (a, b) -> a * b)"
        " FROM (VALUES 1, 2, 3, 4) t(x)",
    )
    assert got == 24


def test_empty_approx_set(eng):
    assert _one(eng, "SELECT CAST(hll_sketch_estimate(empty_approx_set()) AS BIGINT)") == 0
    # usable as a merge identity
    got = _one(
        eng,
        "SELECT CAST(hll_sketch_estimate(hll_union(approx_set(x), empty_approx_set())) AS BIGINT)"
        " FROM (VALUES 1, 2, 3) t(x)",
    )
    assert got == 3


# --------------------------------------------------------------- session


def test_current_groups(eng):
    assert _one(eng, "SELECT current_groups()") == []


# ------------------------------------------- sketch / ML SQL aggregates


SEQ_1000 = (
    "(SELECT CAST(id AS DOUBLE) AS x FROM (SELECT explode(sequence(1, 1000)) AS id))"
)


def test_qdigest_sql_surface(eng):
    got = _one(eng, f"SELECT value_at_quantile(qdigest_agg(x), 0.5) FROM {SEQ_1000}")
    assert abs(got - 500) / 500 < 0.05  # relative-error digest
    got = _one(eng, f"SELECT quantile_at_value(qdigest_agg(x), 500.0) FROM {SEQ_1000}")
    assert abs(got - 0.5) < 0.05


def test_tdigest_sql_surface(eng):
    got = _one(eng, f"SELECT value_at_quantile(tdigest_agg(x), 0.5) FROM {SEQ_1000}")
    assert abs(got - 500.5) < 5
    got = _one(eng, f"SELECT values_at_quantiles(tdigest_agg(x), array[0.25, 0.75]) FROM {SEQ_1000}")
    assert abs(got[0] - 250.5) < 5 and abs(got[1] - 750.5) < 5


def test_setdigest_sql_surface(eng):
    # |A∩B| = 50, |A∪B| = 150 -> jaccard 1/3 (exact under 2048-reg KMV)
    q = (
        "SELECT {f}(make_set_digest(a), make_set_digest(b)) FROM"
        " (SELECT v AS a, v + 50 AS b FROM (SELECT explode(sequence(1, 100)) AS v))"
    )
    assert abs(_one(eng, q.format(f="jaccard_index")) - 1 / 3) < 1e-9
    assert _one(eng, q.format(f="intersection_cardinality")) == 50
    got = _one(eng, "SELECT hash_counts(make_set_digest(x)) FROM (VALUES 1, 2, 2) t(x)")
    assert len(got) == 2


def test_merge_set_digest(eng):
    got = _one(
        eng,
        "SELECT jaccard_index(merge_set_digest(d), merge_set_digest(d)) FROM"
        " (SELECT make_set_digest(x) AS d FROM (VALUES 1, 2, 3) t(x) GROUP BY x % 2)",
    )
    assert got == 1.0


def test_approx_most_frequent_sql(eng):
    got = _one(
        eng,
        "SELECT approx_most_frequent(2, x, 10) FROM (VALUES 'a','a','a','b','b','c') t(x)",
    )
    assert got == {"a": 3, "b": 2}


def test_numeric_histogram_sql(eng):
    got = _one(eng, "SELECT numeric_histogram(2, x) FROM (VALUES 1.0, 1.1, 9.0, 9.2) t(x)")
    assert set(got.values()) == {2.0} and len(got) == 2


def test_ml_sql_surface(eng):
    got = _one(
        eng,
        "SELECT classify(features(2.0, 3.0), m) FROM (SELECT learn_classifier(l,"
        " features(f1, f2)) AS m FROM (VALUES (0, 0.0, 0.0), (0, 0.1, 0.2),"
        " (1, 2.0, 2.5), (1, 3.0, 3.0)) t(l, f1, f2))",
    )
    assert got == 1
    got = _one(
        eng,
        "SELECT regress(features(4.0), m) FROM (SELECT learn_regressor(l,"
        " features(f1)) AS m FROM (VALUES (2.0, 1.0), (4.0, 2.0), (6.0, 3.0)) t(l, f1))",
    )
    assert abs(got - 8.0) < 1e-6


# --------------------------------------------------------- typed literals


def test_typed_literals(eng):
    assert _one(eng, "SELECT REAL '1.5'") == 1.5
    assert _one(eng, "SELECT DOUBLE '1.5'") == 1.5
    assert _one(eng, "SELECT DOUBLE PRECISION '2.5'") == 2.5
    assert _one(eng, "SELECT BIGINT '42'") == 42
    assert _one(eng, "SELECT SMALLINT '4'") == 4
    assert _one(eng, "SELECT VARCHAR 'x'") == "x"
    assert _one(eng, "SELECT JSON '[1,2]'") == "[1,2]"
    assert _one(eng, "SELECT to_hex(to_ieee754_32(REAL '1.0'))") == "3F800000"
    # Spark-native typed literals keep working
    assert str(_one(eng, "SELECT DATE '2024-01-01'")) == "2024-01-01"
    assert float(_one(eng, "SELECT DECIMAL '1.5'")) == 1.5


# ------------------------------------------------- review-fix regressions


def test_touches_point_inside_polygon_is_false(eng):
    sq = "ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')"
    assert _one(eng, f"SELECT ST_Touches(ST_Point(5, 5), {sq})") is False
    assert _one(eng, f"SELECT ST_Touches({sq}, ST_Point(5, 5))") is False
    # boundary contact stays a touch
    assert _one(eng, f"SELECT ST_Touches(ST_Point(0, 5), {sq})") is True


def test_cardinality_heuristic_only_at_top_level(eng):
    # a column merely NAMED like a sketch must still route to size()
    got = _one(eng, "SELECT cardinality(split(hll_col, ',')) FROM (VALUES ('a,b,c')) t(hll_col)")
    assert got == 3
    got = _one(eng, "SELECT cardinality(approx_set(x)) FROM (VALUES 1, 2) t(x)")
    assert got == 2


def test_wkt_scientific_notation_roundtrip(eng):
    got = _one(eng, "SELECT ST_X(ST_GeometryFromText(ST_AsText(ST_Point(1e-10, 3e-10))))")
    assert got == 1e-10


def test_show_functions_excludes_spark_builtins(eng):
    names = {r.function_name for r in eng.sql("SHOW FUNCTIONS").collect()}
    assert "murmur3" in names and "st_point" in names
    assert "explode" not in names  # Spark-native spelling, not Trino surface


def test_learn_classifier_empty_group_returns_null(eng):
    got = _one(
        eng,
        "SELECT learn_classifier(l, features(f)) FROM"
        " (VALUES (CAST(NULL AS INT), CAST(NULL AS DOUBLE))) t(l, f)",
    )
    assert got is None


def test_color_degenerate_range(eng):
    assert _one(eng, "SELECT color(5.0, 3.0, 3.0, rgb(0,0,0), rgb(255,255,255))") == 0xFFFFFF
    assert _one(eng, "SELECT color(1.0, 3.0, 3.0, rgb(0,0,0), rgb(255,255,255))") == 0


def test_merge_tdigest_and_qdigest(eng):
    got = _one(
        eng,
        "SELECT value_at_quantile(merge_tdigest(d), 0.5) FROM (SELECT tdigest_agg(x) AS d"
        " FROM (SELECT CAST(id AS DOUBLE) AS x, id % 4 AS g FROM"
        " (SELECT explode(sequence(1, 1000)) AS id)) GROUP BY g)",
    )
    assert abs(got - 500.5) < 10
    got = _one(
        eng,
        "SELECT value_at_quantile(merge_qdigest(d), 0.5) FROM (SELECT qdigest_agg(x) AS d"
        " FROM (SELECT CAST(id AS DOUBLE) AS x, id % 4 AS g FROM"
        " (SELECT explode(sequence(1, 1000)) AS id)) GROUP BY g)",
    )
    assert abs(got - 500) / 500 < 0.05


def test_sketch_agg_two_phase_plan(eng):
    """Round-6 (VERDICT): the GROUPED_AGG sketch SQL surface must not
    buffer a whole group in one pandas Series. The dialect splits
    f_agg into per-scan-partition partials + a merge aggregate, so the
    plan carries TWO python aggregate stages and the inner one groups
    by the partition salt."""
    df = eng.sql(
        "SELECT value_at_quantile(qdigest_agg(x), 0.5) AS med FROM"
        " (SELECT CAST(id AS DOUBLE) AS x FROM"
        "  (SELECT explode(sequence(1, 2000)) AS id))"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "__sk_salt" in plan
    assert "merge_qdigest" in plan and "qdigest_agg" in plan
    med = df.collect()[0].med
    assert abs(med - 1000) / 1000 < 0.05


def test_sketch_agg_two_phase_groupby_matches_direct(eng):
    """Exact merge algebra: a grouped make_set_digest through the
    two-phase path must produce the same digests a direct single-buffer
    build would (KMV bottom-k is exactly mergeable)."""
    rows = eng.sql(
        "SELECT grp, intersection_cardinality(d, d) AS c FROM"
        " (SELECT id % 3 AS grp, make_set_digest(id) AS d FROM"
        "  (SELECT explode(sequence(1, 999)) AS id) GROUP BY id % 3)"
        " ORDER BY grp"
    ).collect()
    assert [(r.grp, r.c) for r in rows] == [(0, 333), (1, 333), (2, 333)]
