"""Relational operator coverage beyond the TPC-H corpus.

One oracle-checked query per operator family from SURVEY.md §2: window
functions and frames (§2.5), grouping sets / rollup / cube (§2.4 GroupId),
set operations (§2.7), distinct-limit, values, unnest w/ ordinality (§2.9),
lateral, limit/offset + FETCH WITH TIES (§2.6), pivot/unpivot, and the
conditional / min-max-by / filtered / ordered aggregation forms (§2.4).

Determinism rules for oracle comparison:
- every window ORDER BY ends in a unique key (row_number/ntile/lag are
  order-sensitive);
- raw events.ts is never emitted (parquet ns timestamps: Spark truncates to
  µs, DuckDB keeps ns) — always bucketed via date_trunc on both sides;
- count-like sums cast to BIGINT both sides (DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from trino_spark.queries.base import QueryRegistry, t, views

REG = QueryRegistry()


# ---------------------------------------------------------------------------
# Window functions (Trino: main/operator/WindowOperator.java:70; functions in
# main/operator/window/ — RowNumberFunction, RankFunction, LagFunction, ...)
# ---------------------------------------------------------------------------


@REG.add(
    "window_ranking",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(row_number()   OVER w AS BIGINT)  AS rn,
           CAST(rank()         OVER w AS BIGINT)  AS rnk,
           CAST(dense_rank()   OVER w AS BIGINT)  AS drnk,
           percent_rank()      OVER w             AS prnk,
           cume_dist()         OVER w             AS cdist,
           CAST(ntile(4)       OVER w AS BIGINT)  AS quartile
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, rn
    """,
)
def window_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """row_number/rank/dense_rank/percent_rank/cume_dist/ntile over one
    window definition (unique-keyed ORDER BY for determinism)."""
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("o_orderpriority", "rn")
    )


@REG.add(
    "window_offsets",
    """
    SELECT event_id,
           lag(value, 1, -1.0)  OVER w AS prev_value,
           lead(value, 2)       OVER w AS next2_value,
           first_value(value)   OVER w AS first_v,
           last_value(value)    OVER (PARTITION BY user_id ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
           nth_value(value, 3)  OVER (PARTITION BY user_id ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_v
    FROM events
    WHERE user_id % 10 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ORDER BY event_id
    """,
)
def window_offsets(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead with offset+default, first/last/nth_value with full frame
    (Trino: LagFunction.java:30, NthValueFunction.java)."""
    w = W.partitionBy("user_id").orderBy("event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t(spark, sf, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select(
            "event_id",
            F.lag("value", 1, -1.0).over(w).alias("prev_value"),
            F.lead("value", 2).over(w).alias("next2_value"),
            F.first("value").over(w).alias("first_v"),
            F.last("value").over(wfull).alias("last_v"),
            F.nth_value("value", 3).over(wfull).alias("third_v"),
        )
        .orderBy("event_id")
    )


@REG.add(
    "window_frames",
    """
    SELECT o_orderkey,
           sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)     AS moving_sum3,
           avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_avg,
           count(*)          OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le_price
    FROM orders
    WHERE o_custkey % 25 = 0
    ORDER BY o_orderkey
    """,
)
def window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """ROWS and RANGE frames with BETWEEN bounds (Trino: RowsFraming.java:28,
    RangeFraming.java:31)."""
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rng = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_custkey") % 25 == 0)
        .select(
            "o_orderkey",
            F.sum("o_totalprice").over(base.rowsBetween(-2, 0)).alias("moving_sum3"),
            F.avg("o_totalprice").over(base.rowsBetween(W.unboundedPreceding, 0)).alias("running_avg"),
            F.count(F.lit(1))
            .over(rng.rangeBetween(W.unboundedPreceding, 0))
            .alias("n_le_price"),
        )
        .orderBy("o_orderkey")
    )


@REG.add(
    "topn_per_group",
    """
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) ranked
    WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def topn_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """row_number <= k per group. Catalyst plans this as WindowGroupLimit
    (Spark >= 3.5), the same shortcut as Trino's TopNRankingOperator
    (main/operator/TopNRankingOperator.java:40)."""
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t(spark, sf, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", F.col("rn").cast("int").alias("rn"))
        .orderBy("c_nationkey", "rn")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (Trino: GroupIdOperator.java:32)
# ---------------------------------------------------------------------------


@REG.add(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           sum(l_quantity) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP with grouping-id disambiguation of subtotal rows."""
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@REG.add(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           sum(l_extendedprice) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over two keys."""
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("int").alias("gid"), F.sum("l_extendedprice").alias("sum_price"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_price")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@REG.add(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def grouping_sets_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL path — grammar SqlBase.g4:337)."""
    views(spark, sf, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# Set operations (Trino rewrites: SetOperationNodeTranslator.java:58)
# ---------------------------------------------------------------------------


@REG.add(
    "setop_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    ORDER BY o_custkey
    """,
)
def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT DISTINCT."""
    o = t(spark, sf, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


@REG.add(
    "setop_except_all",
    """
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    ORDER BY l_suppkey
    """,
)
def setop_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — Trino rewrites via row_number,
    ImplementExceptAll.java:71; Spark has a native exceptAll)."""
    li = t(spark, sf, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.exceptAll(a).orderBy("l_suppkey")


@REG.add(
    "setop_union_mix",
    """
    SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM (
      SELECT c_nationkey AS x FROM customer
      UNION ALL
      SELECT s_nationkey AS x FROM supplier
      UNION
      SELECT n_nationkey AS x FROM nation
    ) u GROUP BY x ORDER BY x
    """,
)
def setop_union_mix(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL feeding a UNION DISTINCT (per SQL precedence the distinct
    applies to the whole stack), then re-aggregated."""
    cust = t(spark, sf, "customer").select(F.col("c_nationkey").alias("x"))
    sup = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("x"))
    nat = t(spark, sf, "nation").select(F.col("n_nationkey").alias("x"))
    u = cust.unionAll(sup).union(nat).distinct()
    return u.groupBy("x").agg(F.count(F.lit(1)).alias("cnt")).orderBy("x")


@REG.add(
    "distinct_limit",
    """
    SELECT DISTINCT l_suppkey, l_returnflag
    FROM lineitem
    ORDER BY l_suppkey, l_returnflag
    LIMIT 25
    """,
)
def distinct_limit(spark: SparkSession, sf: str) -> DataFrame:
    """DISTINCT + LIMIT (Trino fuses as DistinctLimitOperator,
    main/operator/DistinctLimitOperator.java:36); ordered for determinism."""
    return (
        t(spark, sf, "lineitem")
        .select("l_suppkey", "l_returnflag")
        .distinct()
        .orderBy("l_suppkey", "l_returnflag")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Values / unnest / lateral (Trino: ValuesOperator.java:26, UnnestOperator.java:45)
# ---------------------------------------------------------------------------


@REG.add(
    "values_inline",
    """
    SELECT v.code, r.r_regionkey
    FROM (VALUES ('AF', 'AFRICA'), ('AS', 'ASIA'), ('EU', 'EUROPE')) v(code, rname)
    JOIN region r ON r.r_name = v.rname
    ORDER BY v.code
    """,
)
def values_inline(spark: SparkSession, sf: str) -> DataFrame:
    """Inline VALUES relation joined to a table. The VALUES side is a SQL
    LocalRelation — createDataFrame(list) builds an RDD-backed relation
    that scans with defaultParallelism tasks (measured 3 s for 3 rows at
    local[32]; PERF.md r2)."""
    vals = spark.sql(
        "SELECT * FROM VALUES ('AF', 'AFRICA'), ('AS', 'ASIA'), ('EU', 'EUROPE') AS v(code, rname)"
    )
    return (
        vals.join(t(spark, sf, "region"), F.col("r_name") == F.col("rname"))
        .select("code", "r_regionkey")
        .orderBy("code")
    )


@REG.add(
    "unnest_ordinality",
    """
    SELECT doc_id,
           unnest(string_split(text, ' '))                    AS word,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos
    FROM documents
    WHERE doc_id < 20
    ORDER BY doc_id, pos
    """,
)
def unnest_ordinality(spark: SparkSession, sf: str) -> DataFrame:
    """UNNEST WITH ORDINALITY -> posexplode (Trino: UnnestOperator.java:45,
    grammar SqlBase.g4:505)."""
    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 20)
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select("doc_id", "word", (F.col("pos0") + 1).cast("int").alias("pos"))
        .orderBy("doc_id", "pos")
    )


@REG.add(
    "unnest_word_counts",
    """
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def unnest_word_counts(spark: SparkSession, sf: str) -> DataFrame:
    """explode + re-aggregate (flatMap-shaped plan)."""
    return (
        t(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(20)
    )


@REG.add(
    "lateral_correlated",
    """
    SELECT r.r_name, top_n.n_name
    FROM region r, LATERAL (
      SELECT n_name FROM nation
      WHERE n_regionkey = r.r_regionkey
      ORDER BY n_name LIMIT 2
    ) top_n
    ORDER BY r.r_name, top_n.n_name
    """,
)
def lateral_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery with inner ORDER BY/LIMIT (Trino:
    CorrelatedJoinNode, plan/CorrelatedJoinNode.java:37; Spark >= 3.4
    lateral join)."""
    views(spark, sf, "region", "nation")
    return spark.sql(
        """
        SELECT r.r_name, top_n.n_name
        FROM region r, LATERAL (
          SELECT n_name FROM nation
          WHERE n_regionkey = r.r_regionkey
          ORDER BY n_name LIMIT 2
        ) top_n
        ORDER BY r.r_name, top_n.n_name
        """
    )


# ---------------------------------------------------------------------------
# Limit / offset / ties (Trino: LimitOperator.java:23, ImplementOffset.java,
# ImplementLimitWithTies.java)
# ---------------------------------------------------------------------------


@REG.add(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 10 OFFSET 20
    """,
)
def limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER BY + OFFSET + LIMIT."""
    return t(spark, sf, "orders").select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(20).limit(10)


@REG.add(
    "fetch_with_ties",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             rank() OVER (ORDER BY l_quantity DESC) AS rnk
      FROM lineitem) ranked
    WHERE rnk <= 1
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fetch_with_ties(spark: SparkSession, sf: str) -> DataFrame:
    """FETCH FIRST 1 ROWS WITH TIES via the rank() rewrite — the exact
    transformation Trino applies (ImplementLimitWithTies.java)."""
    w = W.orderBy(F.desc("l_quantity"))
    return (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


@REG.add(
    "pivot_agg",
    """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_agg(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT on the two linestatus values."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
        .orderBy("l_returnflag")
    )


@REG.add(
    "unpivot_stack",
    """
    SELECT p_partkey, attr, val FROM (
      SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    ) u
    WHERE p_partkey < 50
    ORDER BY p_partkey, attr
    """,
)
def unpivot_stack(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT via stack()."""
    return (
        t(spark, sf, "part")
        .filter(F.col("p_partkey") < 50)
        .select(
            "p_partkey",
            F.expr(
                "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE))"
            ).alias("attr", "val"),
        )
        .orderBy("p_partkey", "attr")
    )


# ---------------------------------------------------------------------------
# Aggregation forms (Trino: §2.4 — filtered, ordered, min/max_by, stats)
# ---------------------------------------------------------------------------


@REG.add(
    "agg_stats",
    """
    SELECT l_returnflag,
           CAST(var_samp(l_extendedprice) AS REAL)              AS var_price,
           CAST(stddev_samp(l_extendedprice) AS REAL)           AS std_price,
           CAST(corr(l_extendedprice, l_quantity) AS REAL)      AS corr_pq,
           CAST(covar_samp(l_extendedprice, l_quantity) AS REAL) AS covar_pq,
           min(l_extendedprice)                   AS min_price,
           max(l_extendedprice)                   AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates (Trino: VarianceAggregation.java,
    DoubleCorrelationAggregation.java ...). The moment aggregates are
    summation-order sensitive at the 1e-12 relative level, so both sides
    narrow to float32 — a ~1e-7 relative quantization that absorbs
    engine-order differences deterministically (vs decimal rounding, whose
    tie boundaries order-sensitivity can still straddle)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.var_samp("l_extendedprice").cast("float").alias("var_price"),
            F.stddev_samp("l_extendedprice").cast("float").alias("std_price"),
            F.corr("l_extendedprice", "l_quantity").cast("float").alias("corr_pq"),
            F.covar_samp("l_extendedprice", "l_quantity").cast("float").alias("covar_pq"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_minmax_by",
    """
    SELECT l_returnflag,
           max_by(l_suppkey, l_extendedprice) AS best_supp,
           min_by(l_suppkey, l_extendedprice) AS worst_supp,
           min(l_linestatus)                  AS some_status
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_minmax_by(spark: SparkSession, sf: str) -> DataFrame:
    """max_by/min_by/any_value (Trino: MaxByAggregationFunction.java,
    ArbitraryAggregationFunction.java). any_value is nondeterministic in
    general; here each group has a single status domain only when filtered —
    so we pin it with min for determinism on both sides."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.max_by("l_suppkey", "l_extendedprice").alias("best_supp"),
            F.min_by("l_suppkey", "l_extendedprice").alias("worst_supp"),
            F.min("l_linestatus").alias("some_status"),
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_ordered_collect",
    """
    SELECT l_returnflag,
           array_to_string((array_agg(l_orderkey ORDER BY l_orderkey))[1:5], ',') AS first_keys
    FROM (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem WHERE l_orderkey < 500) d
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_ordered_collect(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered array_agg (Trino: OrderedAccumulatorFactory.java) via
    array_sort(collect_list(...)) reshaping. Emitted as a joined string:
    the driver's canonicalizer sorts rows by value and raw array cells are
    unhashable there."""
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(
            F.array_join(
                F.slice(F.array_sort(F.collect_list("l_orderkey")), 1, 5), ","
            ).alias("first_keys")
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_filter_clause",
    """
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 100000)  AS n_big,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           sum(o_totalprice) FILTER (WHERE o_orderdate >= TIMESTAMP '1997-01-01') AS recent_total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    """agg(x) FILTER (WHERE p) — Trino rewrite
    ImplementFilteredAggregations.java; Spark SQL supports it natively."""
    views(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 100000)  AS n_big,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               sum(o_totalprice) FILTER (WHERE o_orderdate >= TIMESTAMP '1997-01-01') AS recent_total
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@REG.add(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT)  AS n_part,
           sum(l_quantity)                            AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one query (Trino: MarkDistinctOperator
    main/operator/MarkDistinctOperator.java:33; Catalyst: Expand-based
    RewriteDistinctAggregates)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Conditional expressions / casts
# ---------------------------------------------------------------------------


@REG.add(
    "conditional_exprs",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                         AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')  AS status_or_open,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def conditional_exprs(spark: SparkSession, sf: str) -> DataFrame:
    """CASE / NULLIF / COALESCE scalar conditionals."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    ).orderBy("o_orderkey")
