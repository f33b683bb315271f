"""MATCH_RECOGNIZE corpus: row-pattern matching over the events stream.

The funnel query is fully value-checked: greedy `V+ P` with SKIP PAST LAST
ROW semantics is equivalently expressible as a gaps-and-islands SQL (view
runs joined to the immediately-following purchase), which DuckDB runs as
the independent oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from trino_spark.operators.match_recognize import match_recognize
from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()

_FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("match_no", T.LongType()),
        T.StructField("n_views", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
        T.StructField("purchase_value", T.DoubleType()),
    ]
)


@REG.add(
    "match_recognize_funnel",
    """
    WITH o AS (
      SELECT user_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events
    ),
    runs AS (
      SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS grp
      FROM o
    ),
    view_runs AS (
      SELECT user_id, grp, min(rn) AS srn, max(rn) AS ern,
             CAST(count(*) AS BIGINT) AS n_views,
             CAST(epoch_us(min(ts)) AS BIGINT) AS start_us
      FROM runs WHERE event_type = 'view'
      GROUP BY user_id, grp
    )
    SELECT v.user_id,
           CAST(row_number() OVER (PARTITION BY v.user_id ORDER BY v.srn) AS BIGINT) AS match_no,
           v.n_views, v.start_us,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
           round(p.value, 6) AS purchase_value
    FROM view_runs v
    JOIN o p ON p.user_id = v.user_id AND p.rn = v.ern + 1 AND p.event_type = 'purchase'
    ORDER BY v.user_id, match_no
    """,
)
def match_recognize_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion funnel via MATCH_RECOGNIZE: PATTERN (V+ P), V = view,
    P = purchase, ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW —
    each maximal run of views immediately followed by a purchase."""
    e = t(spark, sf, "events").select("user_id", "ts", "event_type", "value")

    define = {
        "V": lambda pdf, i, start: pdf["event_type"].iat[i] == "view",
        "P": lambda pdf, i, start: pdf["event_type"].iat[i] == "purchase",
    }
    define_vec = {
        "V": lambda pdf: pdf["event_type"] == "view",
        "P": lambda pdf: pdf["event_type"] == "purchase",
    }

    def _us(ts) -> int:
        return int(pd.Timestamp(ts).value // 1000)

    measures = {
        "n_views": lambda sl, labels: labels.count("V"),
        "start_us": lambda sl, labels: _us(sl["ts"].iloc[0]),
        "purchase_us": lambda sl, labels: _us(sl["ts"].iloc[-1]),
        "purchase_value": lambda sl, labels: round(float(sl["value"].iloc[-1]), 6),
    }

    def measures_vec(pdf, starts, ends, masks):
        # all-numpy measures over every match at once; V/P are exclusive so
        # n_views = count of V rows in [start, end)
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cum_v = np.concatenate(([0], np.cumsum(masks["V"].astype(np.int64))))
        val = pdf["value"].to_numpy()
        return {
            "n_views": cum_v[ends] - cum_v[starts],
            "start_us": ts_us[starts],
            "purchase_us": ts_us[ends - 1],
            "purchase_value": np.round(val[ends - 1], 6),
        }

    out = match_recognize(
        e,
        partition_by=["user_id"],
        order_by=["ts"],
        pattern="V+ P",
        define=define,
        measures=measures,
        output_schema=_FUNNEL_SCHEMA,
        define_vectorized=define_vec,
        measures_vectorized=measures_vec,
    )
    return out.orderBy("user_id", "match_no")


_BOUNDED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("match_no", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("cls", T.StringType()),
        T.StructField("run_sum", T.DoubleType()),
    ]
)


@REG.add(
    "match_recognize_bounded_allrows",
    """
    WITH ord AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ),
    flags AS (
      SELECT *, (event_type = 'signup') AS s,
             (event_type <> 'signup' AND value >= 30) AS h
      FROM ord
    ),
    starts AS (
      SELECT user_id, rn,
             CASE WHEN h1 AND h2 AND h3 THEN 3
                  WHEN h1 AND h2 THEN 2 END AS hlen
      FROM (SELECT user_id, rn, s,
                   lead(h, 1) OVER w AS h1,
                   lead(h, 2) OVER w AS h2,
                   lead(h, 3) OVER w AS h3
            FROM flags
            WINDOW w AS (PARTITION BY user_id ORDER BY rn)) f
      WHERE s AND h1 AND h2
    ),
    numbered AS (
      SELECT user_id, rn, hlen,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY rn) AS BIGINT) AS match_no
      FROM starts
    ),
    expanded AS (
      SELECT n.user_id, n.match_no, n.rn + g.off AS rn, g.off
      FROM numbered n, LATERAL (SELECT unnest(generate_series(0, n.hlen)) AS off) g
    )
    SELECT e.user_id, e.match_no, o.event_id,
           CASE WHEN e.off = 0 THEN 'S' ELSE 'H' END AS cls,
           round(sum(o.value) OVER (PARTITION BY e.user_id, e.match_no
                                    ORDER BY e.off), 6) AS run_sum
    FROM expanded e JOIN flags o USING (user_id, rn)
    ORDER BY user_id, match_no, event_id
    """,
)
def match_recognize_bounded_allrows(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded quantifier + ALL ROWS PER MATCH (grammar SqlBase.g4:448
    patternQuantifier, Matcher.java bounded repetition): PATTERN (S H{2,3})
    with S = signup, H = any non-signup event with value >= 30, ALL ROWS
    PER MATCH, RUNNING sum measure, CLASSIFIER() per row.

    S rows never qualify as H, so matches start exactly at signup rows and
    can never overlap — which makes greedy SKIP-PAST-LAST semantics exactly
    expressible as the windowed-lead SQL the oracle runs (greedy = take 3
    H rows when the lookahead allows, else 2)."""
    e = t(spark, sf, "events").select("user_id", "event_id", "event_type", "value")

    define_vec = {
        "S": lambda pdf: pdf["event_type"] == "signup",
        "H": lambda pdf: (pdf["event_type"] != "signup") & (pdf["value"] >= 30.0),
    }
    measures = {
        "event_id": lambda sl, labels: int(sl["event_id"].iloc[-1]),
        "cls": lambda sl, labels: labels[-1],
        "run_sum": lambda sl, labels: round(float(sl["value"].sum()), 6),
    }

    def measures_vec_all(pdf, idx, lengths, labels_flat):
        # flat all-rows measures: one gather + a segment-reset cumsum
        v = pdf["value"].to_numpy()[idx]
        cs = np.cumsum(v)
        heads = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        run = cs - np.repeat(cs[heads] - v[heads], lengths)
        return {
            "event_id": pdf["event_id"].to_numpy()[idx],
            "cls": labels_flat,
            "run_sum": np.round(run, 6),
        }

    out = match_recognize(
        e,
        partition_by=["user_id"],
        order_by=["event_id"],
        pattern="S H{2,3}",
        define={},
        measures=measures,
        output_schema=_BOUNDED_SCHEMA,
        define_vectorized=define_vec,
        rows_per_match="all",
        measures_vectorized_all=measures_vec_all,
    )
    return out.orderBy("user_id", "match_no", "event_id")


@REG.add(
    "mr_pattern_window",
    """
    WITH t AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CASE WHEN o_totalprice < lag(o_totalprice) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderkey)
                  THEN 0 ELSE 1 END AS brk
      FROM orders WHERE o_custkey < 200
    ),
    g AS (
      SELECT *, sum(brk) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM t
    ),
    r AS (
      SELECT *,
             count(*) OVER (PARTITION BY o_custkey, grp) AS n_in_grp,
             row_number() OVER (PARTITION BY o_custkey, grp
                                ORDER BY o_orderkey) AS pos,
             last_value(o_totalprice) OVER (
               PARTITION BY o_custkey, grp ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS grp_bottom
      FROM g
    )
    SELECT o_custkey, o_orderkey,
           CAST(n_in_grp - pos + 1 AS BIGINT) AS run_len,
           grp_bottom AS bottom
    FROM r
    ORDER BY o_custkey, o_orderkey
    LIMIT 60
    """,
)
def mr_pattern_window(spark: SparkSession, sf: str) -> DataFrame:
    """Row-pattern recognition in WINDOW (round 6; docs
    pattern-recognition-in-window.md): for every order, the length and
    floor of the price run descending from it — PATTERN (A B*) anchored
    per row, measures with FINAL semantics, unmatched rows impossible
    (A matches any row). The oracle restates the anchored-run measures
    as gaps-and-islands window SQL (a run starting at row r extends to
    the end of r's maximal descending island)."""
    from trino_spark.queries.base import engine_for

    return engine_for(spark, sf).sql(
        """
        SELECT o_custkey, o_orderkey,
               run_len OVER w AS run_len,
               bottom OVER w AS bottom
        FROM (SELECT * FROM orders WHERE o_custkey < 200)
        WINDOW w AS (
          PARTITION BY o_custkey ORDER BY o_orderkey
          MEASURES count(*) AS run_len, LAST(o_totalprice) AS bottom
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
          PATTERN (A B*)
          DEFINE B AS o_totalprice < PREV(o_totalprice)
        )
        ORDER BY o_custkey, o_orderkey
        LIMIT 60
        """
    )
