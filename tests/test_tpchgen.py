"""TPC-H generator source tests (sources/tpchgen.py — the
plugin/trino-tpch generator-connector analog): determinism, cardinality
contract, value ranges, plan shape (no shuffle, no file scan)."""

import pytest

from trino_spark.sources import tpchgen


def test_row_counts(spark):
    assert tpchgen.gen_table(spark, "region", 1.0).count() == 5
    assert tpchgen.gen_table(spark, "nation", 1.0).count() == 25
    assert tpchgen.gen_table(spark, "orders", 0.001).count() == 1500
    assert tpchgen.gen_table(spark, "customer", 0.001).count() == 150


def test_deterministic(spark):
    a = tpchgen.gen_table(spark, "orders", 0.001).orderBy("o_orderkey").limit(20).collect()
    b = tpchgen.gen_table(spark, "orders", 0.001).orderBy("o_orderkey").limit(20).collect()
    assert a == b


def test_value_ranges(spark):
    li = tpchgen.gen_table(spark, "lineitem", 0.001)
    row = li.selectExpr(
        "min(l_quantity) AS qmin",
        "max(l_quantity) AS qmax",
        "min(l_discount) AS dmin",
        "max(l_discount) AS dmax",
        "min(l_linenumber) AS lmin",
        "max(l_linenumber) AS lmax",
    ).collect()[0]
    assert 1 <= row.qmin and row.qmax <= 50
    assert 0.0 <= row.dmin and row.dmax <= 0.10 + 1e-9
    assert row.lmin == 1 and row.lmax == 7


def test_fk_ranges(spark):
    li = tpchgen.gen_table(spark, "lineitem", 0.001)
    n_part = tpchgen.rows_for("part", 0.001)
    n_supp = tpchgen.rows_for("supplier", 0.001)
    row = li.selectExpr(
        "max(l_partkey) AS mp", "max(l_suppkey) AS ms", "min(l_partkey) AS np"
    ).collect()[0]
    assert row.mp < n_part and row.ms < n_supp and row.np >= 0


def test_schema_matches_testdata(spark, sf_dir):
    from trino_spark.queries.base import t

    for name in ("orders", "lineitem", "customer", "supplier", "part", "nation"):
        gen = tpchgen.gen_table(spark, name, 0.001)
        disk = t(spark, sf_dir, name)
        assert [f.name for f in gen.schema.fields] == [f.name for f in disk.schema.fields], name


def test_no_shuffle_no_filescan_in_plan(spark):
    li = tpchgen.gen_table(spark, "lineitem", 0.001)
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "FileScan" not in plan and "Scan parquet" not in plan


def test_queryable_via_views(spark):
    tpchgen.register_tpch_catalog(spark, 0.001)
    out = spark.sql(
        """
        SELECT o.o_orderkey, count(*) AS n
        FROM tpchgen_orders o JOIN tpchgen_lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey LIMIT 5
        """
    ).collect()
    assert [r.n for r in out] == [1 + (k % 7) for k in range(5)]


def test_unknown_table_rejected(spark):
    with pytest.raises(ValueError, match="unknown"):
        tpchgen.gen_table(spark, "partsupp", 1.0)
