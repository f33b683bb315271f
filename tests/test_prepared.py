"""Prepared-statement tests (PREPARE / EXECUTE [IMMEDIATE] / DEALLOCATE).
Reference: grammar SqlBase.g4 prepared statements, PrepareTask.java,
positional `?` parameter binding."""

import pytest

from trino_spark.dialect import TrinoEngine
from trino_spark.dialect.prepared import bind, parse_execute, parse_prepare


def test_parse_and_bind():
    name, body = parse_prepare("PREPARE q FROM SELECT * FROM t WHERE a > ? AND b < ?")
    assert name == "Q" and body.endswith("b < ?")
    assert parse_execute("EXECUTE q USING 1 + 2, 'x,y'") == ("Q", ["1 + 2", "'x,y'"])
    assert bind("SELECT ? + ?", ["1", "2 * 3"]) == "SELECT (1) + (2 * 3)"


def test_bind_arity_mismatch():
    with pytest.raises(ValueError, match="parameters"):
        bind("SELECT ?", ["1", "2"])


def test_question_mark_in_string_untouched():
    assert bind("SELECT '?' , ?", ["7"]) == "SELECT '?' , (7)"


def test_engine_prepared_roundtrip(spark, sf_dir):
    eng = TrinoEngine(spark, sf_dir)
    eng.sql(
        "PREPARE orders_by_prio FROM "
        "SELECT count(*) AS n FROM orders WHERE o_orderpriority = ? AND o_totalprice > ?"
    )
    n1 = eng.sql("EXECUTE orders_by_prio USING '1-URGENT', 1000").first().n
    n2 = eng.sql("EXECUTE orders_by_prio USING '1-URGENT', 1000000000").first().n
    assert n1 > 0 and n2 == 0
    eng.sql("DEALLOCATE PREPARE orders_by_prio")
    with pytest.raises(ValueError, match="not found"):
        eng.sql("EXECUTE orders_by_prio USING 'x', 1")


def test_engine_execute_immediate(spark, sf_dir):
    eng = TrinoEngine(spark, sf_dir)
    row = eng.sql(
        "EXECUTE IMMEDIATE 'SELECT count(*) AS n FROM nation WHERE n_regionkey = ?' USING 0"
    ).first()
    assert row.n > 0
