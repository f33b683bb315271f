"""SQL-registered scalar residue (functions/registry.py): Unicode
normalize, word_stem, base32/HMAC, and the statistical CDF family.
Reference values independently computed (standard statistical tables /
scipy-equivalent closed forms)."""

import pytest

from trino_spark.dialect import TrinoEngine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return TrinoEngine(spark, sf_dir=sf_dir)


def _val(engine, expr):
    return engine.sql(f"SELECT {expr} AS x").collect()[0].x


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("normal_cdf(0, 1, 1.96)", 0.9750021),
        ("inverse_normal_cdf(0, 1, 0.975)", 1.959964),
        ("beta_cdf(2, 5, 0.3)", 0.5798250),
        ("binomial_cdf(45, 100, 0.5)", 0.1841008),
        ("poisson_cdf(3, 2)", 0.4231901),
        ("chi_squared_cdf(2, 3)", 0.7768698),
        ("t_cdf(10, 1.5)", 0.9177463),
        ("f_cdf(2, 5, 3.0)", 0.8607030),
        ("gamma_cdf(2.0, 2.0, 3.0)", 0.4421746),
        ("laplace_cdf(0, 1, 0.5)", 0.6967347),
        ("weibull_cdf(1.5, 1.0, 2.0)", 0.9408943),
        ("cauchy_cdf(0, 1, 1.0)", 0.75),
        ("wilson_interval_lower(100, 1000, 1.96)", 0.0829087),
        ("wilson_interval_upper(100, 1000, 1.96)", 0.1201523),
    ],
)
def test_cdf_values(engine, expr, expected):
    assert _val(engine, expr) == pytest.approx(expected, abs=2e-6)


def test_cdf_monotone_and_bounds(engine):
    vals = [_val(engine, f"beta_cdf(2, 3, {x})") for x in (0.0, 0.2, 0.5, 0.8, 1.0)]
    assert vals == sorted(vals) and vals[0] == 0.0 and vals[-1] == 1.0


def test_normalize_forms(engine):
    row = engine.sql(
        "SELECT length(normalize('é', NFD)) AS nfd, length(normalize('é')) AS nfc"
    ).collect()[0]
    assert row.nfd == 2 and row.nfc == 1


def test_word_stem_sql(engine):
    assert _val(engine, "word_stem('running')") == "run"


def test_base32_roundtrip(engine):
    assert _val(engine, "from_utf8(from_base32(to_base32(to_utf8('hello'))))") == "hello"


def test_hmac_sha256_rfc4231(engine):
    # RFC 4231 test case 2: key 'Jefe', data 'what do ya want for nothing?'
    out = _val(
        engine,
        "lower(to_hex(hmac_sha256(to_utf8('what do ya want for nothing?'), to_utf8('Jefe'))))",
    )
    assert out == "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"


def test_hamming_bit_count_bar(engine):
    row = engine.sql(
        "SELECT hamming_distance('karolin', 'kathrin') AS hd,"
        " bit_count(-7, 8) AS bc, bar(0.3, 10) AS b"
    ).collect()[0]
    assert row.hd == 3 and row.bc == 6 and row.b == "███"


def test_json_array_fns(engine):
    row = engine.sql(
        "SELECT json_array_get('[5,10,15]', 2) AS g,"
        " json_array_contains('[1,2,3]', 2) AS c,"
        " json_array_contains('[1,2,3]', 9) AS nc"
    ).collect()[0]
    assert row.g == "15" and row.c is True and row.nc is False


def test_map_top_n(engine):
    out = _val(engine, "map_top_n(map(array['a','b','c'], array[1,3,2]), 2)")
    assert out == {"b": 3, "c": 2}


def test_parse_duration_and_human_readable(engine):
    assert _val(engine, "parse_duration('1.5h')") == 5_400_000
    assert _val(engine, "human_readable_seconds(96)") == "1 minute, 36 seconds"
    assert _val(engine, "human_readable_seconds(0)") == "0 seconds"


def test_checksum_order_insensitive(engine):
    a = engine.sql("SELECT checksum(n_name) AS x FROM nation WHERE n_regionkey = 0").collect()[0].x
    b = engine.sql(
        "SELECT checksum(n_name) AS x FROM"
        " (SELECT * FROM nation WHERE n_regionkey = 0 ORDER BY n_name DESC)"
    ).collect()[0].x
    assert a == b


def test_null_propagation(engine):
    assert _val(engine, "normal_cdf(0, 1, CAST(NULL AS DOUBLE))") is None
    assert _val(engine, "word_stem(CAST(NULL AS STRING))") is None
