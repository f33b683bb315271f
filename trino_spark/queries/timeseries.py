"""Time-series / event-stream operators over the `events` table.

Trino itself is batch-only (SURVEY.md §2.11 — no watermarks or windows
anywhere in main/operator/); its Kafka connector exposes streams as bounded
scans (reference: plugin/trino-kafka/.../KafkaSplitManager.java:43). This
module is the extension tier: the windowed/ordered operators a 100 TB event
pipeline needs, built batch-first with the SAME primitives Structured
Streaming uses (`window()`, `session_window()` — see
trino_spark/streaming/ for the readStream counterparts).

Scale notes:
- Tumbling/sliding windows: `F.window` is a projection (no shuffle beyond
  the groupBy on (window, key)); sliding emits one row per overlapping
  window map-side — no self-join.
- Sessionization & as-of join: single shuffle on user_id, then
  window-function scans within each user partition. The as-of join is the
  union-tag formulation (sort-merge within partition, last-value carry),
  NOT a range self-join — O(n log n) per key instead of O(n·m).
- Range join: time-bucketed equi-join (bucket + bucket-1) so the probe
  touches only adjacent buckets — the standard bounded-interval join
  decomposition; never a full inequality cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()


@REG.add(
    "ts_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY ws, event_type
    ORDER BY ws, event_type
    """,
)
def ts_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly tumbling-window aggregation per event type (streaming-shaped:
    the identical expression runs under readStream with a watermark)."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
        .orderBy("ws", "event_type")
    )


@REG.add(
    "ts_sliding_window",
    """
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
             event_type,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events
    )
    SELECT ws, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST((2 * sum(v6) + count(*)) // (2 * count(*)) AS BIGINT) AS avg_value_micros
    FROM expanded
    GROUP BY ws, event_type
    ORDER BY ws, event_type
    """,
)
def ts_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in two
    windows — Spark's window() expands map-side, no self-join).

    The windowed average is surfaced as half-up integer MICROS computed
    from an exact integer sum (floor(v*1e6+0.5) per value, then
    floor((2S+n)/(2n))): a rounded double avg differs between engines in
    the last ulp on ~1 in 2000 groups at sf0.1 (round(43.4728125, 6)
    landed 43.472812 vs 43.472813 — the half-way class the playbook's
    exact-integer rule exists for). Values are non-negative so integer
    division semantics agree across engines."""
    e = t(spark, sf, "events")
    v6 = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        e.withColumn("v6", v6)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("(2 * sum(v6) + count(*)) div (2 * count(*))").alias(
                "avg_value_micros"
            ),
        )
        .select(
            F.col("w.start").alias("ws"), "event_type", "n_events", "avg_value_micros"
        )
        .orderBy("ws", "event_type")
    )


@REG.add(
    "ts_session_window",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6, 6) AS duration_s
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def ts_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag
    → running sum = session id → per-session rollup. One shuffle on
    user_id; sessions never cross partitions."""
    e = t(spark, sf, "events")
    byu = W.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(byu)
    marked = e.select(
        "user_id", "ts", "value",
        F.when(prev.isNull() | (F.unix_micros("ts") - F.unix_micros(prev) > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "session_id", F.sum("is_new").over(byu.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1e6, 6).alias(
                "duration_s"
            ),
        )
        .select(
            "user_id", F.col("session_id").cast("long").alias("session_id"),
            "session_start_us", "n_events", "duration_s",
        )
        .orderBy("user_id", "session_id")
    )


@REG.add(
    "ts_asof_join",
    """
    SELECT p.event_id,
           p.user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
           round(c.value, 6) AS click_value,
           round(CAST(epoch_us(p.ts) - epoch_us(c.ts) AS DOUBLE) / 1e6, 6) AS lag_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def ts_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF join: each purchase matched to the user's most recent click at
    or before it. Implemented as the union-tag scan — tag both sides, sort
    within user, carry the last click forward with last_value(ignoreNulls)
    — one shuffle, no range self-join (DuckDB oracle uses its native ASOF
    JOIN, an independent implementation)."""
    e = t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("c_value"), F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("double").alias("c_value"), F.lit(1).alias("side"),
        "event_id",
    )
    # At equal ts the click sorts first (side 0) => "at or before" semantics.
    both = clicks.unionByName(purch)
    w = W.partitionBy("user_id").orderBy("ts", "side").rowsBetween(W.unboundedPreceding, 0)
    carried = both.select(
        "user_id", "ts", "side", "event_id",
        F.last("c_value", ignorenulls=True).over(w).alias("click_value"),
        F.last(F.when(F.col("side") == 0, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts_us"),
    )
    return (
        carried.filter((F.col("side") == 1) & F.col("click_value").isNotNull())
        .select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("purchase_ts_us"),
            "click_ts_us",
            F.round("click_value", 6).alias("click_value"),
            F.round((F.unix_micros("ts") - F.col("click_ts_us")) / 1e6, 6).alias("lag_s"),
        )
        .orderBy("event_id")
    )


@REG.add(
    "ts_range_join",
    """
    SELECT p.event_id,
           CAST(count(*) AS BIGINT) AS n_recent_clicks,
           round(sum(c.value), 6) AS click_value_sum
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '10 minutes'
     AND c.ts < p.ts
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def ts_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-interval range join: clicks in the 10 minutes before each
    purchase, decomposed into an equi-join on 10-minute buckets (probe hits
    bucket b and b-1 only) + residual predicate — never an unbounded
    inequality join."""
    e = t(spark, sf, "events")
    bucket_us = 10 * 60 * 1_000_000
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.unix_micros("ts").alias("c_us"),
        F.col("value").alias("c_value"),
        F.floor(F.unix_micros("ts") / bucket_us).alias("c_bucket"),
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.unix_micros("ts").alias("p_us"))
        .withColumn("p_bucket", F.floor(F.col("p_us") / bucket_us))
        # each purchase probes its own bucket and the previous one
        .withColumn("probe_bucket", F.explode(F.array(F.col("p_bucket"), F.col("p_bucket") - 1)))
    )
    joined = purch.join(
        clicks,
        (purch.user_id == clicks.c_user)
        & (purch.probe_bucket == clicks.c_bucket)
        & (clicks.c_us >= purch.p_us - bucket_us)
        & (clicks.c_us < purch.p_us),
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_recent_clicks"),
            F.round(F.sum("c_value"), 6).alias("click_value_sum"),
        )
        .orderBy("event_id")
    )


@REG.add(
    "ts_gap_fill",
    """
    WITH hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-07 23:00:00',
                                    INTERVAL '1 hour')) AS hr
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hr, event_type,
             count(*) AS cnt
      FROM events
      WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      GROUP BY hr, event_type
    )
    SELECT h.hr, t.event_type, CAST(coalesce(a.cnt, 0) AS BIGINT) AS n_events
    FROM hours h CROSS JOIN types t
    LEFT JOIN actual a ON a.hr = h.hr AND a.event_type = t.event_type
    ORDER BY h.hr, t.event_type
    """,
)
def ts_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filling / resampling: dense hourly grid (sequence+explode) ×
    event types, left-joined to actual hourly counts, zeros filled. The
    dense grid is generated, never scanned — tiny broadcast side."""
    e = t(spark, sf, "events")
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit("2024-01-01 00:00:00")),
                F.to_timestamp(F.lit("2024-01-07 23:00:00")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hr")
    )
    types = e.select("event_type").distinct()
    actual = (
        e.filter(F.col("ts") < F.to_timestamp(F.lit("2024-01-08 00:00:00")))
        .groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        hours.crossJoin(types)
        .join(actual, ["hr", "event_type"], "left")
        .select("hr", "event_type", F.coalesce("cnt", F.lit(0)).cast("long").alias("n_events"))
        .orderBy("hr", "event_type")
    )


@REG.add(
    "ts_ohlc",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           round(min_by(value, ts), 6) AS open,
           round(max(value), 6)        AS high,
           round(min(value), 6)        AS low,
           round(max_by(value, ts), 6) AS close,
           CAST(count(*) AS BIGINT)    AS n
    FROM events
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def ts_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """Daily OHLC candles per event type — min_by/max_by keyed on the
    timestamp (Trino's MaxByAggregationFunction family) in one pass."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(
            F.round(F.min_by("value", "ts"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", "ts"), 6).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("day", "event_type")
    )
