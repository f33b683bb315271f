"""Type-semantics parity (SURVEY.md §1.2): decimal(38) arithmetic, interval
arithmetic, try_cast behavior, and the documented timestamp-precision
policy — checked against DuckDB where both engines define the semantics."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def test_decimal38_exact_arithmetic(spark, duck):
    got = spark.sql(
        """SELECT CAST('12345678901234567890.123456789' AS DECIMAL(38,9))
                  + CAST('0.000000001' AS DECIMAL(38,9)) AS s,
                  CAST('99999999999999999999' AS DECIMAL(38,0))
                  * CAST(3 AS DECIMAL(38,0)) AS p"""
    ).first()
    want = duck.execute(
        """SELECT CAST('12345678901234567890.123456789' AS DECIMAL(38,9))
                  + CAST('0.000000001' AS DECIMAL(38,9)) AS s,
                  CAST('99999999999999999999' AS DECIMAL(38,0))
                  * CAST(3 AS DECIMAL(38,0)) AS p"""
    ).fetchone()
    assert got.s == want[0] == Decimal("12345678901234567890.123456790")
    assert got.p == want[1] == Decimal("299999999999999999997")


def test_decimal_overflow_yields_null_not_error(spark):
    # ANSI off (session.py): overflow -> NULL, like Trino's try(); Trino
    # proper raises — documented divergence, SURVEY.md §1.2.
    r = spark.sql(
        "SELECT CAST('9' AS DECIMAL(38,0)) * CAST(repeat('9', 38) AS DECIMAL(38,0)) AS x"
    ).first()
    assert r.x is None


def test_interval_arithmetic(spark, duck):
    got = spark.sql(
        """SELECT DATE '2024-01-31' + INTERVAL '1' MONTH AS m,
                  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '90' MINUTE AS t"""
    ).first()
    want = duck.execute(
        """SELECT DATE '2024-01-31' + INTERVAL '1' MONTH AS m,
                  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '90' MINUTE AS t"""
    ).fetchone()
    assert str(got.m) == str(want[0].date() if hasattr(want[0], "date") else want[0])
    assert got.t == want[1]


def test_try_cast_family(spark):
    r = spark.sql(
        """SELECT try_cast('abc' AS INT) AS a,
                  try_cast('42' AS INT) AS b,
                  try_divide(1, 0) AS c,
                  try_cast('2024-13-99' AS DATE) AS d"""
    ).first()
    assert r.a is None and r.b == 42 and r.c is None and r.d is None


def test_timestamp_truncation_policy(spark, sf_dir):
    # events.ts is ns in parquet; our loader floors to µs (catalog.load),
    # matching DuckDB's TIMESTAMP_NS -> TIMESTAMP cast. p<=6 is exact.
    from trino_spark.catalog import load

    ts = load(spark, sf_dir, "events").select("ts").first().ts
    assert ts.microsecond is not None  # µs precision survives


def test_char_varchar_semantics(spark):
    # Trino CHAR pads on comparison; Spark StringType does not — we follow
    # Spark (documented gap). Equality on trailing spaces must differ:
    r = spark.sql("SELECT 'a' = 'a ' AS eq, rtrim('a ') = 'a' AS eq2").first()
    assert r.eq is False and r.eq2 is True


class TestJsonTableNested:
    """NESTED PATH subset of JSON_TABLE (operators/json_table.py)."""

    def test_two_levels_with_empty_child(self, spark):
        from trino_spark.operators.json_table import ColumnSpec, NestedSpec, json_table

        df = spark.createDataFrame(
            [(1, '[{"o": 10, "items": [{"sku": "a"}, {"sku": "b"}]}, {"o": 11, "items": []}]')],
            "id: int, j: string",
        )
        out = json_table(
            df,
            "j",
            "lax $[*]",
            [ColumnSpec("o", "int"), NestedSpec("lax $.items[*]", (ColumnSpec("sku"),))],
        ).select("o", "sku")
        rows = sorted((r.o, r.sku) for r in out.collect())
        # o=11 has no items but survives (PLAIN LEFT OUTER)
        assert rows == [(10, "a"), (10, "b"), (11, None)]

    def test_three_levels(self, spark):
        from trino_spark.operators.json_table import ColumnSpec, NestedSpec, json_table

        doc = '[{"a": 1, "bs": [{"b": 2, "cs": [{"c": 3}, {"c": 4}]}]}]'
        df = spark.createDataFrame([(doc,)], "j: string")
        out = json_table(
            df,
            "j",
            "$",
            [
                ColumnSpec("a", "int"),
                NestedSpec(
                    "lax $.bs[*]",
                    (ColumnSpec("b", "int"), NestedSpec("lax $.cs[*]", (ColumnSpec("c", "int"),))),
                ),
            ],
        ).select("a", "b", "c")
        assert sorted(tuple(r) for r in out.collect()) == [(1, 2, 3), (1, 2, 4)]

    def test_sibling_nested_rejected(self, spark):
        import pytest as _pytest

        from trino_spark.operators.json_table import ColumnSpec, NestedSpec, json_table

        df = spark.createDataFrame([('[{"x": []}]',)], "j: string")
        with _pytest.raises(ValueError, match="one NESTED"):
            json_table(
                df,
                "j",
                "$",
                [NestedSpec("$.x[*]", ()), NestedSpec("$.y[*]", ())],
            )
