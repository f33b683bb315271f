"""TPC-DS generator contracts (sources/tpcdsgen.py): the real dsdgen
calendar invariants that make the vendored query literals land on data,
determinism, and write-once materialization."""

import os

from pyspark.sql import functions as F

from trino_spark.sources import tpcdsgen


def test_date_dim_calendar_contract(spark):
    d = tpcdsgen.gen_table(spark, "date_dim")
    assert d.count() == tpcdsgen.N_DATE
    first = d.orderBy("d_date_sk").first()
    assert first.d_date_sk == 2_415_022 and str(first.d_date) == "1900-01-02"
    # d_month_seq 1200 == January 2000 (q51 literal), 1212 == January 2001 (q6)
    jan2000 = d.filter(F.col("d_month_seq") == 1200).select("d_year", "d_moy").distinct().collect()
    assert [(r.d_year, r.d_moy) for r in jan2000] == [(2000, 1)]
    jan2001 = d.filter((F.col("d_year") == 2001) & (F.col("d_moy") == 1)).select(
        "d_month_seq"
    ).distinct().collect()
    assert [r.d_month_seq for r in jan2001] == [1212]


def test_generation_is_deterministic(spark):
    key = ["ss_ticket_number", "ss_item_sk", "ss_sales_price"]
    a = tpcdsgen.gen_table(spark, "store_sales").orderBy(*key).limit(50).collect()
    b = tpcdsgen.gen_table(spark, "store_sales").orderBy(*key).limit(50).collect()
    assert a == b


def test_sales_dates_join_date_dim(spark):
    dd = tpcdsgen.gen_table(spark, "date_dim")
    ss = tpcdsgen.gen_table(spark, "store_sales")
    joined = ss.join(dd, ss.ss_sold_date_sk == dd.d_date_sk)
    assert joined.count() == tpcdsgen.N_STORE_SALES  # every sale has a calendar day
    years = {r.d_year for r in joined.select("d_year").distinct().collect()}
    assert years == {1998, 1999, 2000, 2001, 2002}


def test_money_columns_are_decimal(spark):
    ss = tpcdsgen.gen_table(spark, "store_sales")
    assert dict(ss.dtypes)["ss_ext_sales_price"] == "decimal(12,2)"


def test_materialization_is_write_once(spark, tmp_path):
    base = str(tmp_path / "tpcds")
    tpcdsgen.ensure_materialized(spark, base)
    stamp = {
        p: os.stat(os.path.join(base, "item", p)).st_mtime_ns
        for p in os.listdir(os.path.join(base, "item"))
        if p.endswith(".parquet")
    }
    tpcdsgen.ensure_materialized(spark, base)  # second call: no rewrite
    assert {
        p: os.stat(os.path.join(base, "item", p)).st_mtime_ns
        for p in os.listdir(os.path.join(base, "item"))
        if p.endswith(".parquet")
    } == stamp


def test_tickets_group_lines(spark):
    """q34/q46/q73 contract: every line of a ticket shares date/store/
    customer; ticket sizes are bimodal — full 20-line tickets (q34's
    15-20 band) and 4-line sub-tickets from split blocks (q73's 1-5)."""
    ss = tpcdsgen.gen_table(spark, "store_sales")
    from pyspark.sql import functions as F

    g = ss.groupBy("ss_ticket_number").agg(
        F.count("*").alias("n"),
        F.countDistinct("ss_sold_date_sk", "ss_store_sk", "ss_customer_sk").alias("k"),
    )
    row = g.agg(F.max("n"), F.min("n"), F.max("k")).collect()[0]
    assert row[0] == tpcdsgen.TICKET_LINES  # unsplit blocks stay 20-line
    assert row[1] == tpcdsgen.TICKET_LINES // 5  # split sub-tickets
    assert row[2] == 1
