"""Write-path round-trips and streaming==batch equivalence checks."""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from trino_spark import writes
from trino_spark.catalog import load
from trino_spark.queries import all_specs

_TMP = Path(__file__).resolve().parents[1] / ".tmp_test"


@pytest.fixture()
def tmp_dir():
    _TMP.mkdir(exist_ok=True)
    d = _TMP / "scratch"
    if d.exists():
        shutil.rmtree(d)
    d.mkdir()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_ctas_roundtrip(spark, sf_dir, tmp_dir):
    src = load(spark, sf_dir, "orders")
    path = str(tmp_dir / "orders_ctas")
    writes.ctas(src, path, compact_to=2)
    back = writes.read_back(spark, path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)


def test_partitioned_write_prunes(spark, sf_dir, tmp_dir):
    src = load(spark, sf_dir, "orders")
    path = str(tmp_dir / "orders_part")
    writes.ctas(src, path, partition_by=["o_orderpriority"], compact_to=1)
    back = writes.read_back(spark, path)
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    # partition pruning must reach the scan (PartitionFilters, not PushedFilters)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() == src.filter(F.col("o_orderpriority") == "1-URGENT").count()


def test_insert_append_and_dynamic_overwrite(spark, sf_dir, tmp_dir):
    src = load(spark, sf_dir, "region")
    path = str(tmp_dir / "region_tbl")
    writes.ctas(src, path, partition_by=["r_regionkey"])
    writes.insert_into(
        src.withColumn("r_regionkey", F.col("r_regionkey") + 100),
        path,
        partition_by=["r_regionkey"],
    )
    assert writes.read_back(spark, path).count() == 2 * src.count()
    # dynamic overwrite touches only partition 0; others must survive
    one = src.filter(F.col("r_regionkey") == 0).withColumn("r_name", F.lit("REWRITTEN"))
    writes.overwrite_partitions(one, path, ["r_regionkey"])
    back = writes.read_back(spark, path)
    assert back.count() == 2 * src.count()
    assert back.filter(F.col("r_regionkey") == 0).select("r_name").first().r_name == "REWRITTEN"


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_dir):
    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf_dir)
    agg = streaming.windowed_counts(events)
    streaming.run_available_now(agg, "stream_tumbling", str(tmp_dir / "ckpt"))
    got = {
        (r.ws, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("stream_tumbling").collect()
    }
    want = {
        (r.ws, r.event_type): (r.n_events, r.sum_value)
        for r in all_specs()["ts_tumbling_window"].build(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_session_counts_match_batch_totals(spark, sf_dir, tmp_dir):
    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf_dir)
    sess = streaming.sessionized_counts(events)
    streaming.run_available_now(sess, "stream_sessions", str(tmp_dir / "ckpt2"))
    stream_df = spark.table("stream_sessions")
    batch = all_specs()["ts_session_window"].build(spark, sf_dir)
    # same number of sessions per user and same total event coverage
    assert stream_df.count() == batch.count()
    assert (
        stream_df.agg(F.sum("n_events")).first()[0]
        == batch.agg(F.sum("n_events")).first()[0]
    )


def test_stateful_running_totals_match_batch(spark, sf_dir, tmp_dir):
    from trino_spark import streaming
    from pyspark.sql import functions as F

    events = streaming.read_events_stream(spark, sf_dir)
    stateful = streaming.running_user_totals(events)
    q = (
        stateful.writeStream.format("memory")
        .queryName("stream_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_dir / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user equals the batch totals
    got = {
        r.user_id: (r.n_events, r.value_sum)
        for r in spark.table("stream_state").collect()
    }
    batch = {
        r.user_id: (r.n, r.s)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    }
    assert got == batch


def test_bucketed_ctas_elides_join_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge-join with no Exchange on either side (co-located join —
    the bucketing scale story; see writes.ctas_bucketed docstring)."""
    from trino_spark.catalog import load
    from trino_spark.writes import ctas_bucketed

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    ctas_bucketed(orders, "t_orders_b", 8, ["o_orderkey"], ["o_orderkey"])
    ctas_bucketed(li, "t_lineitem_b", 8, ["l_orderkey"], ["l_orderkey"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_orders_b").join(
                spark.table("t_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_stream_stream_interval_join_left_outer(spark, sf_dir):
    """Left-outer stream-stream join: unmatched left rows surface with
    NULL right side once the watermark closes their interval."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf_dir)
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase").withColumnRenamed("value", "p_value")
    joined = streaming.stream_stream_interval_join(views, purchases, within="30 minutes", how="leftOuter")
    name = f"ij_lo_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        streaming.run_available_now(
            joined.select(F.col("l.event_id").alias("view_id"), F.col("r.p_value").alias("p_value")),
            name,
            tempfile.mkdtemp(prefix="ckpt_"),
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name)
    total_views = views.sparkSession.read.parquet(f"{sf_dir}/events.parquet").filter(
        "event_type = 'view'"
    ).count()
    n_left = out.select("view_id").distinct().count()
    matched = out.filter("p_value IS NOT NULL").count()
    unmatched = out.filter("p_value IS NULL").count()
    assert matched > 0 and unmatched > 0
    # Every view appears (matched, or unmatched-with-NULL) EXCEPT views in
    # the final watermark horizon: the replay ends before the watermark
    # can prove their interval has no future match, so they stay buffered
    # — correct left-outer streaming semantics, not data loss.
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F2

    max_ts = ev.agg(F2.max("ts")).collect()[0][0]
    tail = ev.filter(
        (F2.col("event_type") == "view")
        & (F2.col("ts") >= F2.lit(max_ts) - F2.expr("INTERVAL 90 MINUTES"))
    ).count()
    assert total_views - tail <= n_left <= total_views


# ---------------------------------------------------- CDC upsert sink


class TestUpsertSink:
    def _mk_target(self, tmp_path):
        return str(tmp_path / "state")

    def test_batches_merge_and_replay_is_idempotent(self, spark, tmp_path):
        import json
        import os

        from trino_spark.streaming import read_upsert_state, run_upsert_sink

        target = self._mk_target(tmp_path)
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")

        def batch(rows):
            return spark.createDataFrame(rows, "user_id long, value double")

        def stream():
            return spark.readStream.schema("user_id long, value double").parquet(src)

        # incremental files through ONE checkpoint: monotonic batch ids
        batch([(1, 1.0), (2, 2.0)]).coalesce(1).write.mode("append").parquet(src)
        run_upsert_sink(stream(), target, ckpt)
        batch([(1, 3.0), (3, 4.0)]).coalesce(1).write.mode("append").parquet(src)
        run_upsert_sink(stream(), target, ckpt)

        def snapshot():
            return {r.user_id: (r.n_events, r.value_sum)
                    for r in read_upsert_state(spark, target).collect()}

        state = snapshot()
        assert state[1][0] == 2 and abs(state[1][1] - 4.0) < 1e-9
        assert state[2] == (1, 2.0) and state[3] == (1, 4.0)
        # at-least-once replay: a FRESH checkpoint re-delivers everything
        # as batch 0 — the applied-batch manifest must skip it
        run_upsert_sink(stream(), target, str(tmp_path / "ckpt_replay"))
        assert snapshot() == state
        manifest = json.load(open(os.path.join(target, "_manifest.json")))
        assert manifest["current"].startswith("v")
        assert 0 in manifest["applied"] and 1 in manifest["applied"]

    def test_empty_state_reader(self, spark, tmp_path):
        from trino_spark.streaming import read_upsert_state

        df = read_upsert_state(spark, str(tmp_path / "nowhere"))
        assert df.count() == 0
        assert [f.name for f in df.schema] == ["user_id", "n_events", "value_sum"]
