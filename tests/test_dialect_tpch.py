"""The full TPC-H SQL corpus executed as TEXT through TrinoEngine.sql.

The DataFrame builders in queries/tpch.py are the primary implementations;
this suite proves the migration story — the same ANSI SQL a reference user
runs can be pasted into the dialect entry point (translate -> Catalyst)
and produce DuckDB-identical results. Every clause Trino's grammar uses in
these queries (correlated/scalar subqueries, semi/anti shapes via
EXISTS/IN, multi-way joins, grouped aggregates, HAVING, ORDER/LIMIT)
crosses the tokenizer + rewrite pipeline here.
"""

import pytest

from trino_spark.dialect import TrinoEngine
from trino_spark.queries import all_specs
from trino_spark.testing import assert_same_results

_TPCH = {n: s for n, s in all_specs().items() if n[0] == "q" and n[1].isdigit()}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return TrinoEngine(spark, sf_dir=sf_dir)


@pytest.mark.parametrize("name", sorted(_TPCH))
def test_tpch_sql_through_dialect(engine, duck, name):
    spec = _TPCH[name]
    assert_same_results(engine.sql(spec.oracle), duck.execute(spec.oracle).fetch_df(), name)
