"""Structured Streaming view of the `events` table.

Trino has NO streaming runtime (SURVEY.md §2.11 — no watermarks, windows,
or stateful operators anywhere in core/trino-main/src/main/java/io/trino/
operator/; its Kafka connector reads bounded offset ranges,
plugin/trino-kafka/.../KafkaSplitManager.java:43). This package is the
extension tier: the SAME windowed aggregations the batch corpus verifies
(queries/timeseries.py), expressed over `readStream` so they run
incrementally with watermark-bounded state.

Design: batch and stream share the aggregation expressions; tests replay
the parquet through Trigger.AvailableNow into a memory sink and assert the
result equals the batch query — the classic backfill==live equivalence
check, which is exactly what makes these operators trustworthy on an
unbounded 100 TB/day feed (state is bounded by the watermark horizon, not
the stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Raw schema of events.parquet as the batch reader sees it — the ts
    physical type varies by generator version (ns → LongType under
    nanosAsLong; µs → TIMESTAMP_NTZ), so probe the footer instead of
    hardcoding."""
    import os

    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as an unbounded source (file-stream; in production the
    same DataFrame comes from Kafka/Kinesis — the plan below is identical).

    ts is normalized to TimestampType exactly as catalog.load does for the
    batch path, so stream==batch equivalence tests compare like for like."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _events_schema(spark, sf_dir)
    # The file-stream source wants a directory; scope it to the events file
    # with a glob so sibling tables (different schemas) stay invisible.
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(ts_type, T.TimestampType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Hourly tumbling counts with watermark-bounded state (late rows beyond
    the horizon are dropped; state size = #types × horizon/1h windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-close semantics identical to the batch
    lag/cumsum formulation in queries/timeseries.py ts_session_window)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def run_available_now(
    stream_df: DataFrame, table_name: str, checkpoint_dir: str, output_mode: str = "complete"
) -> None:
    """Replay the whole source through the streaming engine once
    (Trigger.AvailableNow) into an in-memory sink; blocks until done.
    output_mode: "complete" for aggregations, "append" for joins/maps."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value sum with inactivity timeout — the kind of operator
    that has NO batch/SQL equivalent (Trino has no stateful streaming at
    all, SURVEY.md §2.11). State per key is two scalars, bounded by the
    active-user set; the timeout evicts idle users.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches, state: GroupState):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "value_sum": [round(total, 6)]})

    # Production deployments bound state with
    # GroupStateTimeout.ProcessingTimeTimeout + state.setTimeoutDuration(ms)
    # to evict idle users; NoTimeout keeps the replay-equivalence test
    # deterministic (a pending timeout holds the AvailableNow drain open).
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_sum double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication, first-occurrence-wins.

    The streaming tier of the LLM-pipeline dedup family (operators/
    dedup.py exact_dedup is the batch analog): dropDuplicatesWithinWatermark
    keeps the seen-keys state bounded by the watermark horizon instead of
    growing with the stream — the requirement for a 100 TB/day ingest feed,
    where duplicates arrive close together (retries, replays) and an
    unbounded seen-set would OOM. Key = (user_id, event_type, minute
    bucket): any duplicate arriving within the horizon is dropped."""
    keyed = events.withColumn(
        "dedup_key",
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            "event_type",
            F.date_trunc("minute", "ts").cast("string"),
        ),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["dedup_key"]
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream inner join with an event-time range:
    right rows within [left.ts, left.ts + within]. The range condition +
    both watermarks bound the join state (Spark evicts buffered rows once
    the watermark passes the interval), so state is O(traffic within the
    horizon) — the production shape for click->conversion attribution.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    # leftOuter emits the unmatched left row once the watermark passes its
    # interval (Spark can only then prove no future match arrives).
    return l.join(r, cond, how)


def run_upsert_sink(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    state_partitions: int = 1,
) -> None:
    """CDC-apply sink: per-user deltas of each micro-batch are merged into
    a parquet state table via foreachBatch — the lakehouse upsert pattern
    (stream → MERGE INTO target) that Kafka-fed deployments run against
    Delta/Iceberg tables.

    Exactly-once on top of foreachBatch's at-least-once: every applied
    batch_id is recorded in an atomically-replaced manifest that also
    names the CURRENT state version — a replayed batch is skipped, and a
    crash between state write and manifest commit leaves the previous
    version current (snapshot-style commit, same shape as dialect/dml.py's
    snapshot log). Scale: state I/O per batch is one read + one write of
    the (small) per-key state table; the event stream itself is never
    rewritten. For very large key spaces the same pattern partitions the
    state table by key bucket and rewrites only touched buckets."""
    import json
    import os

    spark = events.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(target_dir, exist_ok=True)
        manifest_path = os.path.join(target_dir, "_manifest.json")
        manifest = {"applied": [], "current": None}
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                manifest = json.load(fh)
        if batch_id in manifest["applied"]:
            return  # replay after restart: already applied, skip (idempotent)
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum")
        )
        if manifest["current"]:
            cur = spark.read.parquet(os.path.join(target_dir, manifest["current"]))
            merged = (
                cur.alias("c")
                .join(delta.alias("d"), "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(F.col("c.n_events"), F.lit(0))
                        + F.coalesce(F.col("d.n_events"), F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("c.value_sum"), F.lit(0.0))
                        + F.coalesce(F.col("d.value_sum"), F.lit(0.0))
                    ).alias("value_sum"),
                )
            )
        else:
            merged = delta
        version = f"v{batch_id}"
        # The per-key state table is orders of magnitude smaller than the
        # stream; write it with `state_partitions` files (default 1) so a
        # micro-batch doesn't pay a 32-task write for a few thousand rows.
        # A huge key space raises this (and bucket-partitions the state).
        merged.coalesce(state_partitions).write.mode("overwrite").parquet(
            os.path.join(target_dir, version)
        )
        manifest = {
            "applied": sorted(set(manifest["applied"]) | {batch_id}),
            "current": version,
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, manifest_path)  # atomic commit
        # Retention: superseded state versions are dead after the commit —
        # keep only the new current (readers that raced the swap still see
        # the previous manifest's files until their read completes, and
        # AvailableNow applies are sequential, so pruning prior versions
        # here is safe; a multi-reader deployment keeps a retention window
        # like dialect/dml.py expire_snapshots).
        import shutil

        for entry in os.listdir(target_dir):
            if (
                entry.startswith("v")
                and entry != version
                and entry[1:].isdigit()
            ):
                shutil.rmtree(os.path.join(target_dir, entry), ignore_errors=True)

    q = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_upsert_state(spark: SparkSession, target_dir: str) -> DataFrame:
    """Current committed state of a run_upsert_sink target."""
    import json
    import os

    manifest_path = os.path.join(target_dir, "_manifest.json")
    if not os.path.exists(manifest_path):
        return spark.createDataFrame(
            [], "user_id long, n_events long, value_sum double"
        )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(os.path.join(target_dir, manifest["current"]))
