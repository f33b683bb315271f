"""Driver-visible streaming queries: the Structured Streaming extension
(SURVEY §2.11 — Trino has no streaming tier) exercised through the SAME
oracle gate as batch queries.

Each builder replays the full events source through the streaming engine
with Trigger.AvailableNow (exactly the plan a Kafka-fed deployment runs,
minus the unbounded source), lands the result in a memory sink, and
returns it as a DataFrame. The DuckDB oracle computes the identical
aggregation in batch SQL — so the watermark/window/state machinery itself
is value-checked, not just rows-counted.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_spark.queries.base import QueryRegistry

REG = QueryRegistry()


@REG.add(
    "streaming_tumbling_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start, event_type
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked tumbling-window counts through the streaming engine
    (readStream -> withWatermark -> window agg -> AvailableNow replay),
    value-checked against the batch equivalent. State stays bounded by
    the watermark horizon; at scale the identical plan consumes Kafka."""
    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf)
    agg = streaming.windowed_counts(events)
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    streaming.run_available_now(agg, name, tempfile.mkdtemp(prefix="ckpt_"))
    out = spark.table(name)
    return (
        out.select(
            F.date_format("ws", "yyyy-MM-dd HH:00").alias("hour_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
        )
        .orderBy("hour_start", "event_type")
    )


@REG.add(
    "streaming_stateful_user_totals",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS value_sum
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_stateful_user_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState running
    per-user totals — the §2.11 extension Trino has no analog for),
    replayed with AvailableNow and value-checked against the batch
    aggregate. Update-mode sink: the LAST emitted row per user equals the
    final state."""
    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf)
    totals = streaming.running_user_totals(events)
    name = f"stream_totals_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    # update mode appends one row per state change per batch; keep the last
    w = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "user_id"
        ).orderBy(F.desc("n_events"))
    )
    return (
        out.withColumn("_rk", w)
        .filter(F.col("_rk") == 1)
        .select("user_id", F.col("n_events").cast("long").alias("n_events"), "value_sum")
        .orderBy("user_id")
    )


@REG.add(
    "streaming_dedup_events",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_unique
    FROM (
      SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS m
      FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_dedup_events(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark — watermark-
    bounded seen-keys state; the streaming tier of the dedup operator
    family). AvailableNow replay into a memory sink, then a batch count of
    survivors per type, value-checked against batch DISTINCT."""
    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf)
    deduped = streaming.dedup_events(events)
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
        .orderBy("event_type")
    )


@REG.add(
    "streaming_interval_join",
    """
    SELECT v.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(p.value), 6) AS sum_purchase
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
)
def streaming_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join (view -> purchase attribution within 30
    minutes): two watermarked streams, event-time range condition bounding
    the join state, AvailableNow replay. The oracle is the identical batch
    interval join — the streaming buffers/eviction machinery is what's
    being value-checked."""
    from trino_spark import streaming

    events = streaming.read_events_stream(spark, sf)
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase").withColumnRenamed(
        "value", "p_value"
    )
    joined = streaming.stream_stream_interval_join(views, purchases, within="30 minutes")
    name = f"stream_ij_{uuid.uuid4().hex[:8]}"
    # Stream-stream joins allocate one state-store instance per shuffle
    # partition PER SIDE per microbatch; at this volume 8 partitions cut
    # fixed state overhead ~4x with identical results (at production
    # volume you'd size this to traffic, not lower it).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        streaming.run_available_now(
            joined.select(F.col("l.user_id").alias("user_id"), F.col("r.p_value").alias("p_value")),
            name,
            tempfile.mkdtemp(prefix="ckpt_"),
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name)
    return (
        out.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("p_value"), 6).alias("sum_purchase"),
        )
        .orderBy("user_id")
    )


@REG.add(
    "streaming_upsert_sink",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS value_sum
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_upsert_sink(spark: SparkSession, sf: str) -> DataFrame:
    """CDC-apply / MERGE-upsert sink (streaming.run_upsert_sink): the
    events source is split into 6 files so AvailableNow delivers REAL
    successive micro-batches (maxFilesPerTrigger=1); each batch's per-user
    deltas are merged into a snapshot-committed parquet state table with
    an applied-batch manifest (exactly-once on at-least-once foreachBatch).
    The oracle is the batch aggregation over the whole source — equality
    proves the incremental merge chain reproduces the global group-by."""
    import os
    import tempfile

    from trino_spark import streaming
    from trino_spark.catalog import load

    src_dir = tempfile.mkdtemp(prefix="upsert_src_")
    load(spark, sf, "events").select("user_id", "value").repartition(6).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    target = tempfile.mkdtemp(prefix="upsert_state_")
    streaming.run_upsert_sink(stream, target, tempfile.mkdtemp(prefix="ckpt_"))
    out = streaming.read_upsert_state(spark, target)
    return out.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("value_sum", 6).alias("value_sum"),
    ).orderBy("user_id")
