"""JDBC federation: plan-level pushdown assertions + oracle differential
(queries/federation_q.py; Trino reference: plugin/trino-base-jdbc)."""

from pyspark.sql import functions as F

from trino_spark.queries import federation_q


def test_jdbc_filter_pushdown_in_plan(spark, sf_dir):
    n = federation_q.jdbc_nation(spark, sf_dir).filter(F.col("n_regionkey") <= 2)
    plan = n._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert "PushedFilters" in plan and "LessThanOrEqual(n_regionkey,2)" in plan, plan


def test_jdbc_roundtrip_matches_parquet(spark, sf_dir):
    from trino_spark.queries.base import t

    jdbc_rows = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in federation_q.jdbc_nation(spark, sf_dir).collect()
    )
    pq_rows = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey").collect()
    )
    assert jdbc_rows == pq_rows


def test_federated_join_oracle(spark, sf_dir, duck):
    spec = federation_q.REG.specs()["jdbc_federated_join"]
    from trino_spark.testing import assert_same_results

    assert_same_results(spec.build(spark, sf_dir), duck.execute(spec.oracle).fetch_df(), spec.name)


def test_jdbc_aggregate_pushdown_in_plan(spark, sf_dir):
    """The DSv2 JDBC catalog pushes the ENTIRE aggregation to the remote
    database (PushAggregationIntoTableScan.java:65 analog): the scan node
    carries PushedAggregates + PushedGroupByExpressions."""
    df = federation_q.jdbc_agg_pushdown(spark, sf_dir)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedAggregates: [COUNT(*)" in plan, plan
    assert "PushedGroupByExpressions: [n_regionkey]" in plan, plan
