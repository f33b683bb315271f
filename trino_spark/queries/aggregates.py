"""Aggregate-function parity corpus (SURVEY.md §2.4 / §2.8).

Covers the Trino aggregate library beyond the basics already exercised by
the TPC-H and relational corpora: statistical aggregates (corr/covar/regr —
reference: core/trino-main/.../aggregation/DoubleCorrelationAggregation.java,
DoubleRegressionAggregation.java), bool/bit aggregates
(BooleanAndAggregation.java), geometric_mean, checksum
(ChecksumAggregationFunction.java), histogram (histogram/Histogram.java),
map_agg / map_union (MapAggregationFunction.java, MapUnionAggregation.java),
listagg (listagg/ListaggAggregationFunction.java), reduce_agg
(ReduceAggregationFunction.java), numeric_histogram (NumericHistogram.java),
approx_distinct / approx_percentile (ApproximateCountDistinctAggregation.java,
TDigestAggregationFunction.java), approx_most_frequent
(ApproximateMostFrequentHistogram.java), and the GROUPS window frame
(main/operator/window/GroupsFraming.java:28) which Spark lacks — emulated
with dense_rank arithmetic per SURVEY.md §2.5.

Scale notes: every query here is a single hash-aggregation (one shuffle on
the grouping key, map-side partial agg automatic); the GROUPS-frame
emulation deliberately aggregates per (partition, rank-group) FIRST so the
window slides over the (small) distinct-group frame, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()


def _md5_60bit(col) -> F.Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as BIGINT.

    Stands in for Trino checksum()'s per-row hash (reference:
    main/operator/aggregation/ChecksumAggregationFunction.java) with a
    formulation both Spark and DuckDB can compute exactly.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


@REG.add(
    "agg_corr_regr",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)         AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 6)   AS covar_s,
           round(covar_pop(l_quantity, l_extendedprice), 6)    AS covar_p,
           round(regr_slope(l_extendedprice, l_quantity), 6)   AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)      AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_corr_regr(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family: corr, covar_samp/pop, regr_slope/
    intercept/r2/count per return flag."""
    li = t(spark, sf, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(q, p), 6).alias("corr_qty_price"),
            F.round(F.covar_samp(q, p), 6).alias("covar_s"),
            F.round(F.covar_pop(q, p), 6).alias("covar_p"),
            F.round(F.regr_slope(p, q), 6).alias("slope"),
            F.round(F.regr_intercept(p, q), 6).alias("intercept"),
            F.round(F.regr_r2(p, q), 6).alias("r2"),
            F.regr_count(p, q).cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_bool_bit",
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 5000)  AS all_over_5k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(bit_and(o_custkey) AS BIGINT) AS custkey_and,
           CAST(bit_or(o_custkey) AS BIGINT)  AS custkey_or,
           CAST(bit_xor(o_custkey) AS BIGINT) AS custkey_xor
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_bool_bit(spark: SparkSession, sf: str) -> DataFrame:
    """bool_and/bool_or and bitwise and/or/xor aggregates per priority."""
    o = t(spark, sf, "orders")
    ck = F.col("o_custkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 5000).alias("all_over_5k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.bit_and(ck).cast("long").alias("custkey_and"),
            F.bit_or(ck).cast("long").alias("custkey_or"),
            F.bit_xor(ck).cast("long").alias("custkey_xor"),
        )
        .orderBy("o_orderpriority")
    )


@REG.add(
    "agg_geomean_checksum",
    """
    SELECT p_brand,
           round(exp(avg(ln(p_retailprice))), 6) AS geo_mean_price,
           CAST(bit_xor(CAST(('0x' || substr(md5(p_name), 1, 15)) AS BIGINT)) AS BIGINT)
             AS name_checksum,
           CAST(count(*) AS BIGINT) AS n
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def agg_geomean_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """geometric_mean (exp∘avg∘ln) and an order-independent content
    checksum (xor of 60-bit md5 prefixes) per brand."""
    p = t(spark, sf, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.round(F.exp(F.avg(F.ln("p_retailprice"))), 6).alias("geo_mean_price"),
            F.bit_xor(_md5_60bit(F.col("p_name"))).cast("long").alias("name_checksum"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("p_brand")
    )


@REG.add(
    "agg_histogram_map",
    """
    SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
)
def agg_histogram_map(spark: SparkSession, sf: str) -> DataFrame:
    """histogram()/map_agg(): builds a lang→count map per source, then
    explodes it back to rows (the map is the operator under test; the
    exploded form gives a stable oracle shape)."""
    d = t(spark, sf, "documents")
    per = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    hist = per.groupBy("source").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "cnt"))).alias("hist")
    )
    return (
        hist.select("source", F.explode("hist").alias("lang", "cnt"))
        .orderBy("source", "lang")
    )


@REG.add(
    "agg_map_union",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def agg_map_union(spark: SparkSession, sf: str) -> DataFrame:
    """map_union(): per-source histogram maps merged by summing values
    across maps (explode → re-aggregate — the scalable merge: one extra
    shuffle on the map key, never a driver-side fold)."""
    d = t(spark, sf, "documents")
    per = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    maps = per.groupBy("source").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "cnt"))).alias("hist")
    )
    return (
        maps.select(F.explode("hist").alias("lang", "cnt"))
        .groupBy("lang")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .orderBy("lang")
    )


@REG.add(
    "agg_listagg",
    """
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def agg_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """listagg(x, ',' ORDER BY x): ordered string concatenation aggregate
    (reference: main/operator/aggregation/listagg/)."""
    r, n = t(spark, sf, "region"), t(spark, sf, "nation")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


@REG.add(
    "agg_reduce_product",
    """
    SELECT l_orderkey,
           round(product(1.0 + l_tax), 6) AS tax_factor,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_orderkey < 1000
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def agg_reduce_product(spark: SparkSession, sf: str) -> DataFrame:
    """reduce_agg(): lambda-fold aggregation — compounded tax factor per
    order via F.aggregate over the collected multiplier list (reference:
    main/operator/aggregation/ReduceAggregationFunction.java)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    return (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(1.0 + F.col("l_tax")).alias("fs"), F.count(F.lit(1)).alias("n_lines"))
        .select(
            "l_orderkey",
            F.round(F.aggregate("fs", F.lit(1.0), lambda acc, x: acc * x), 6).alias("tax_factor"),
            "n_lines",
        )
        .orderBy("l_orderkey")
    )


@REG.add(
    "agg_numeric_histogram",
    """
    SELECT CAST(least(floor(l_extendedprice / 10000), 9) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi,
           CAST((2 * sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) + count(*))
                // (2 * count(*)) AS BIGINT) AS mean_cents
    FROM lineitem
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def agg_numeric_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """numeric_histogram / width_bucket binning: fixed-width price buckets
    with per-bucket stats (single shuffle on the computed bucket). The
    bucket mean is a half-up integer CENTS average from an exact integer
    sum — `round(avg(double), 6)` is the half-way-ulp class the sf0.1
    audit flagged on ts_sliding_window (min/max rounding is safe: both
    engines round the IDENTICAL double)."""
    li = t(spark, sf, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / 10000), F.lit(9)).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
            F.expr(
                "(2 * sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) + count(*))"
                " div (2 * count(*))"
            ).alias("mean_cents"),
        )
        .orderBy("bucket")
    )


@REG.add(
    "agg_top_frequent",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, event_type
    LIMIT 5
    """,
)
def agg_top_frequent(spark: SparkSession, sf: str) -> DataFrame:
    """Exact heavy hitters (the ground truth approx_most_frequent
    approximates): top-5 event types by frequency."""
    e = t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
        .limit(5)
    )


@REG.add("agg_approx_family", None)
def agg_approx_family(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch aggregates: approx_count_distinct (HLL++, Trino's
    approx_distinct) and approx_percentile next to their exact values.
    Engine-specific sketches have no cross-engine oracle; error bounds are
    asserted in tests/test_aggregates.py (driver: rows-only)."""
    li = t(spark, sf, "lineitem")
    # Two passes joined on the (tiny) group key: combining countDistinct
    # with sketch aggregates in one agg triggers the Expand-based distinct
    # plan, which runs every sketch over the expanded input (measured ~6x
    # slower than two clean passes + a 3-row join).
    pcts = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        pcts[0].alias("approx_p50"),
        pcts[1].alias("approx_p90"),
    )
    # countDistinct and exact percentile must also stay in separate passes:
    # together they trigger the Expand plan and the percentile buffers the
    # 2x-expanded input (measured 6.7s vs 1.6+1.7s split at sf0.1).
    exact_cd = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_orders"),
    )
    exact_pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
    )
    exact = exact_cd.join(exact_pct, "l_returnflag")
    return (
        approx.join(exact, "l_returnflag")
        .select(
            "l_returnflag", "approx_orders", "exact_orders",
            "approx_p50", "exact_p50", "approx_p90",
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "window_groups_frame",
    """
    WITH o AS (
      SELECT o_orderkey, o_orderpriority, o_orderdate, o_totalprice,
             dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS g
      FROM orders WHERE o_orderkey < 2000
    ),
    per_g AS (
      SELECT o_orderpriority, g, sum(o_totalprice) AS gsum
      FROM o GROUP BY o_orderpriority, g
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate,
           round((SELECT sum(p.gsum) FROM per_g p
                  WHERE p.o_orderpriority = o.o_orderpriority
                    AND p.g BETWEEN o.g - 1 AND o.g + 1), 2) AS groups_frame_sum
    FROM o
    ORDER BY o_orderpriority, o_orderdate, o_orderkey
    """,
)
def window_groups_frame(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING frame sum — Spark has no
    GROUPS frames (SURVEY.md §2.5 gap), so: dense_rank → per-group partial
    sums → RANGE frame over the rank (peer groups collapse to one row each,
    the window slides over groups not rows) → join back. The oracle states
    the same semantics independently as a correlated rank-distance subquery.
    """
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    part = W.partitionBy("o_orderpriority").orderBy("o_orderdate")
    ranked = o.select(
        "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice",
        F.dense_rank().over(part).alias("g"),
    )
    per_g = ranked.groupBy("o_orderpriority", "g").agg(F.sum("o_totalprice").alias("gsum"))
    frame = W.partitionBy("o_orderpriority").orderBy("g").rangeBetween(-1, 1)
    framed = per_g.select("o_orderpriority", "g", F.sum("gsum").over(frame).alias("groups_frame_sum"))
    return (
        ranked.join(framed, ["o_orderpriority", "g"])
        .select(
            "o_orderkey", "o_orderpriority", "o_orderdate",
            F.round("groups_frame_sum", 2).alias("groups_frame_sum"),
        )
        .orderBy("o_orderpriority", "o_orderdate", "o_orderkey")
    )


@REG.add(
    "sketch_most_frequent",
    """
    WITH counts AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    per AS (
      SELECT c_nationkey,
             string_agg(c_mktsegment || ':' || cnt, ',' ORDER BY cnt DESC, c_mktsegment) AS top3
      FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                                         ORDER BY cnt DESC, c_mktsegment) AS rk
            FROM counts) r
      WHERE rk <= 3
      GROUP BY c_nationkey
    ),
    g AS (
      SELECT string_agg(c_mktsegment || ':' || cnt, ',' ORDER BY cnt DESC, c_mktsegment) AS top3_global
      FROM (SELECT c_mktsegment, CAST(sum(cnt) AS BIGINT) AS cnt,
                   row_number() OVER (ORDER BY sum(cnt) DESC, c_mktsegment) AS rk
            FROM counts GROUP BY c_mktsegment) s
      WHERE rk <= 3
    )
    SELECT per.c_nationkey, per.top3, g.top3_global
    FROM per, g
    ORDER BY per.c_nationkey
    """,
)
def sketch_most_frequent(spark: SparkSession, sf: str) -> DataFrame:
    """approx_most_frequent as a storable/mergeable SpaceSaving sketch
    (ApproximateMostFrequentHistogram.java): per-nation sketches of market
    segments, merged to a global sketch. mktsegment NDV (5) < k (8), so
    err = 0 and the sketch is EXACT — the oracle checks both the per-group
    build and the merge path value-for-value; trimming + error-bound
    behavior under k < NDV is pinned in tests/test_spacesaving.py."""
    from trino_spark.operators import spacesaving as ss

    c = t(spark, sf, "customer").select("c_nationkey", "c_mktsegment")
    per = ss.spacesaving_agg(c, ["c_nationkey"], "c_mktsegment", k=8)
    merged = ss.spacesaving_merge(
        per.select(F.lit(1).alias("_g"), "sketch"), ["_g"], k=8
    )
    per_out = per.select(
        "c_nationkey", ss.most_frequent_string("sketch", 3).alias("top3")
    )
    global_out = merged.select(ss.most_frequent_string("sketch", 3).alias("top3_global"))
    return per_out.crossJoin(F.broadcast(global_out)).orderBy("c_nationkey")


@REG.add(
    "agg_entropy",
    """
    SELECT l_returnflag,
           round(entropy(l_linestatus), 6) AS status_entropy,
           round(entropy(month(l_shipdate)), 6) AS month_entropy,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy aggregate (core/.../aggregation/ShannonEntropyAggregation
    family; log2 of the empirical value distribution, matching DuckDB's
    entropy()). Two hash aggregations — count per (group, value), then
    -sum(p*log2 p) per group — both codegen'd; no value buffering, so a
    high-cardinality group costs rows, not memory."""
    li = t(spark, sf, "lineitem")

    def ent(col: str, out) -> DataFrame:
        # H = log2(N) - sum(c*log2 c)/N over per-value counts: one extra
        # hash-agg instead of buffering values or a window pass.
        return (
            li.groupBy("l_returnflag", col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("l_returnflag")
            .agg(
                F.round(
                    F.log2(F.sum("_c"))
                    - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c"),
                    6,
                ).alias(out)
            )
        )

    def ent_month() -> DataFrame:
        return (
            li.select("l_returnflag", F.month("l_shipdate").alias("_m"))
            .groupBy("l_returnflag", "_m")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("l_returnflag")
            .agg(
                F.round(
                    F.log2(F.sum("_c"))
                    - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c"),
                    6,
                ).alias("month_entropy")
            )
        )

    a = ent("l_linestatus", "status_entropy")
    b = ent_month()
    n = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        a.join(b, "l_returnflag")
        .join(n, "l_returnflag")
        .select("l_returnflag", "status_entropy", "month_entropy", "n")
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_minmax_by_n",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_suppkey, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_suppkey ASC) AS rd,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice ASC, l_suppkey ASC) AS ra
      FROM lineitem
    )
    SELECT l_returnflag,
           array_to_string(list(CASE WHEN rd <= 3 THEN l_suppkey END ORDER BY rd)
                             FILTER (rd <= 3), ',') AS top3_supps,
           array_to_string(list(CASE WHEN ra <= 3 THEN l_suppkey END ORDER BY ra)
                             FILTER (ra <= 3), ',') AS bottom3_supps
    FROM ranked
    WHERE rd <= 3 OR ra <= 3
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_minmax_by_n(spark: SparkSession, sf: str) -> DataFrame:
    """N-argument max_by/min_by (Trino: max_by(x, y, n) returning an array,
    MaxByNAggregationFunction.java). Spark lacks the n-variant, so it is
    composed as rank-filter + ordered collect: row_number per group then
    collect the <=n survivors. Catalyst turns the rank filter into
    WindowGroupLimit (partial top-n BEFORE the shuffle), so executor memory
    is O(n) per group — never collect_list of the whole group. Ties broken
    by the value column on both sides; arrays emitted as CSV strings so the
    driver canonicalizer can hash them."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").select("l_returnflag", "l_suppkey", "l_extendedprice")

    def _topn(descending: bool, alias: str) -> DataFrame:
        order = (
            [F.col("l_extendedprice").desc(), F.col("l_suppkey").asc()]
            if descending
            else [F.col("l_extendedprice").asc(), F.col("l_suppkey").asc()]
        )
        w = Window.partitionBy("l_returnflag").orderBy(*order)
        return (
            li.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .groupBy("l_returnflag")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("rn"), F.col("l_suppkey")))),
                        lambda s: s["l_suppkey"].cast("string"),
                    ),
                    ",",
                ).alias(alias)
            )
        )

    return (
        _topn(True, "top3_supps")
        .join(_topn(False, "bottom3_supps"), "l_returnflag")
        .orderBy("l_returnflag")
    )
