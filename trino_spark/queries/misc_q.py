"""Remaining aggregate/scalar parity: ordered statistics (median, mode,
skewness, kurtosis — reference: main/operator/aggregation/
DoubleSkewnessAggregation.java, KurtosisAggregation.java), HLL sketches as
mergeable columns (spi/type/HyperLogLogType.java — sketch states stored and
merged, not just approx_distinct scalars), width_bucket, luhn_check and
printf-style format (main/operator/scalar/MathFunctions.java:79
width_bucket, LuhnCheckFunction.java:25, FormatFunction.java:78)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()


@REG.add(
    "agg_median_mode",
    """
    SELECT l_returnflag,
           round(median(l_extendedprice), 6) AS med,
           mode(l_linestatus)                AS common_status,
           round(skewness(l_extendedprice), 3) AS skew,
           round(kurtosis(l_extendedprice), 3) AS kurt,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_median_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-statistic aggregates: exact median, mode, skewness, kurtosis
    (kurtosis rounded to 3 — engines differ in the sample-correction term
    beyond that).

    Scale note: Spark's exact median/mode buffer per-group values
    (ObjectHashAggregate). At 100 TB route median through
    approx_percentile(x, 0.5) — a mergeable sketch, no buffering — and
    mode through approx_most_frequent (operators/spacesaving.py); the
    exact forms here are the ORACLE-comparable correctness surface."""
    li = t(spark, sf, "lineitem")
    # median/mode are ObjectHashAggregate (buffering); keeping them out of
    # the codegen'd moments pass avoids forcing the whole agg into the
    # object path over the full input.
    buffered = li.groupBy("l_returnflag").agg(
        F.round(F.expr("median(l_extendedprice)"), 6).alias("med"),
        F.expr("mode(l_linestatus)").alias("common_status"),
    )
    moments = li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 3).alias("skew"),
        F.round(F.kurtosis("l_extendedprice"), 3).alias("kurt"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        buffered.join(moments, "l_returnflag")
        .select("l_returnflag", "med", "common_status", "skew", "kurt", "n")
        .orderBy("l_returnflag")
    )


@REG.add("sketch_hll_union", None)
def sketch_hll_union(spark: SparkSession, sf: str) -> DataFrame:
    """HLL sketches as first-class mergeable columns (Trino's HyperLogLog
    type + merge()): per-source sketches of customer keys, merged via
    hll_union_agg, estimates next to exact counts. Engine-specific binary
    layout -> rows-only; error bounds asserted in tests."""
    o = t(spark, sf, "orders")
    per = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").cast("long").alias("exact"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
    )
    return (
        per.select(
            "grp", F.hll_sketch_estimate("sk").alias("est"), "exact",
        )
        .crossJoin(F.broadcast(merged))
        .orderBy("grp")
    )


@REG.add(
    "func_misc_ops",
    """
    SELECT n_nationkey,
           printf('%s#%03d', n_name, n_nationkey) AS tag,
           CASE WHEN n_nationkey < 0 THEN 0
                WHEN n_nationkey >= 25 THEN 11
                ELSE CAST(floor(n_nationkey / 2.5) AS INTEGER) + 1 END AS wb,
           CASE WHEN n_nationkey % 2 = 0 THEN true ELSE false END AS even_key,
           repeat('ab', CAST(n_nationkey % 3 AS INTEGER)) AS rep
    FROM nation
    ORDER BY n_nationkey
    """,
)
def func_misc_ops(spark: SparkSession, sf: str) -> DataFrame:
    """format_string (printf), width_bucket (DuckDB side emulated with the
    equivalent floor arithmetic), parity/bool exprs, string repeat."""
    n = t(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        F.format_string("%s#%03d", F.col("n_name"), F.col("n_nationkey")).alias("tag"),
        F.expr("width_bucket(n_nationkey, 0, 25, 10)").cast("int").alias("wb"),
        (F.col("n_nationkey") % 2 == 0).alias("even_key"),
        F.expr("repeat('ab', CAST(n_nationkey % 3 AS INT))").alias("rep"),
    ).orderBy("n_nationkey")


@REG.add(
    "json_table_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def json_table_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON_TABLE-style projection (reference: SQL/JSON json_table,
    main/operator/table/json/): from_json with an explicit schema turns the
    JSON column into typed columns inside codegen — the scalable path (one
    parse per row, no per-field re-parse like chained get_json_object)."""
    from pyspark.sql import types as T

    e = t(spark, sf, "events").filter(F.col("event_id") < 500)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.select("event_id", F.from_json("props", schema).alias("j"))
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 10).alias("k_mod"),
    ).orderBy("event_id")


@REG.add(
    "interval_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL '3' MONTH, '%Y-%m-%d')  AS plus_3mo,
           strftime(o_orderdate - INTERVAL '45' DAY, '%Y-%m-%d')   AS minus_45d,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr,
           strftime(last_day(o_orderdate), '%Y-%m-%d')             AS month_end
    FROM orders
    WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
)
def interval_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """INTERVAL YEAR TO MONTH / DAY TO SECOND arithmetic (SURVEY §1.2 — the
    two Trino interval families map 1:1 to Spark interval types)."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 400)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d + F.expr("INTERVAL 3 MONTH"), "yyyy-MM-dd").alias("plus_3mo"),
        F.date_format(d - F.expr("INTERVAL 45 DAY"), "yyyy-MM-dd").alias("minus_45d"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("qtr"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    ).orderBy("o_orderkey")


@REG.add("sketch_quantile_union", None)
def sketch_quantile_union(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable quantile-sketch columns (Trino qdigest/tdigest:
    spi/type/QuantileDigestType.java, QuantileDigestFunctions.java:40
    value_at_quantile + merge): per-priority price sketches, merged to a
    global sketch, estimates next to exact percentiles. Engine-specific
    layout -> rows-only; error bounds asserted in tests."""
    from trino_spark.operators import quantile_sketch as qs

    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.col("o_totalprice").alias("price")
    )
    per = qs.qsketch_agg(o, ["grp"], "price")
    # map-fold merge (one agg, no explode/second shuffle) + single-fold
    # multi-quantile read — PERF.md r2
    merged = qs.qsketch_merge_maps(per.select(F.lit("ALL").alias("g"), "qsketch"), ["g"])
    pq = qs.values_at_quantiles("qsketch", [0.5, 0.9])
    per_out = per.select(
        "grp",
        F.round(pq[0], 4).alias("p50_est"),
        F.round(pq[1], 4).alias("p90_est"),
    )
    merged_out = merged.select(
        F.round(qs.values_at_quantiles("qsketch", [0.5])[0], 4).alias("p50_all")
    )
    return per_out.crossJoin(F.broadcast(merged_out)).orderBy("grp")


@REG.add("sketch_setdigest_jaccard", None)
def sketch_setdigest_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """SetDigest columns (main/type/setdigest/SetDigest.java,
    SetDigestFunctions.java: make_set_digest, merge_set_digest, cardinality,
    jaccard_index, intersection_cardinality): per-priority digests of the
    customers who placed orders, every priority compared against 1-URGENT,
    plus a merged all-priorities digest. Sketch estimates are engine-specific
    -> rows-only; error bounds vs exact sets asserted in tests."""
    from trino_spark.operators import setdigest as sd

    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.col("o_custkey").alias("ck")
    )
    per = sd.make_set_digest(o, ["grp"], "ck")
    urgent = F.broadcast(
        per.filter(F.col("grp") == "1-URGENT").select(F.col("digest").alias("ref"))
    )
    merged = F.broadcast(
        sd.merge_set_digest(per.select(F.lit("ALL").alias("g"), "digest"), ["g"])
        .select(sd.cardinality("digest").alias("card_all"))
    )
    return (
        per.crossJoin(urgent)
        .crossJoin(merged)
        .select(
            "grp",
            sd.cardinality("digest").alias("card_est"),
            F.round(sd.jaccard_index("digest", "ref"), 4).alias("jaccard_vs_urgent"),
            sd.intersection_cardinality("digest", "ref").alias("inter_vs_urgent"),
            "card_all",
        )
        .orderBy("grp")
    )


@REG.add(
    "func_luhn_check",
    """
    WITH t AS (
      SELECT c_custkey, CAST(c_custkey * 7919 AS VARCHAR) AS s
      FROM customer WHERE c_custkey <= 1000
    )
    SELECT c_custkey, s,
           (list_sum(list_transform(generate_series(1, length(s)),
              i -> CASE WHEN (length(s) - i) % 2 = 1
                        THEN CASE WHEN 2 * CAST(substr(s, CAST(i AS INT), 1) AS INT) > 9
                                  THEN 2 * CAST(substr(s, CAST(i AS INT), 1) AS INT) - 9
                                  ELSE 2 * CAST(substr(s, CAST(i AS INT), 1) AS INT) END
                        ELSE CAST(substr(s, CAST(i AS INT), 1) AS INT) END)) % 10 = 0) AS ok
    FROM t
    ORDER BY c_custkey
    """,
)
def func_luhn_check(spark: SparkSession, sf: str) -> DataFrame:
    """luhn_check (LuhnCheckFunction.java:25) as a sequence+aggregate
    expression; DuckDB oracle re-derives the mod-10 rule with list lambdas."""
    from trino_spark.functions.strings import luhn_check

    c = t(spark, sf, "customer").filter(F.col("c_custkey") <= 1000)
    return (
        c.select(
            "c_custkey",
            (F.col("c_custkey") * 7919).cast("string").alias("s"),
        )
        .select("c_custkey", "s", luhn_check("s").alias("ok"))
        .orderBy("c_custkey")
    )


@REG.add(
    "json_table_flatten",
    """
    WITH src AS (
      SELECT user_id, event_id, event_type, round(value, 6) AS val
      FROM events WHERE user_id < 50
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS seq,
           CAST(event_id AS BIGINT) AS event_id,
           event_type,
           val
    FROM src
    ORDER BY user_id, seq
    """,
)
def json_table_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """JSON_TABLE (SQL/JSON-2016 PTF; main/operator/table/json/,
    JsonPath.g4): events are packed into one JSON document per user
    (to_json), then JSON_TABLE flattens them back with a lax row path,
    scalar COLUMNS and FOR ORDINALITY. The oracle computes the same rows
    relationally — the JSON pack/unpack must be the identity."""
    from trino_spark.operators.json_table import ColumnSpec, json_table

    ev = (
        t(spark, sf, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_id", "event_type", F.round("value", 6).alias("val"))
    )
    packed = ev.groupBy("user_id").agg(
        F.to_json(
            F.struct(
                F.sort_array(
                    F.collect_list(F.struct("event_id", "event_type", "val"))
                ).alias("events")
            )
        ).alias("doc")
    )
    flat = json_table(
        packed,
        "doc",
        "lax $.events[*]",
        [
            ColumnSpec("seq", ordinality=True),
            ColumnSpec("event_id", "long", "lax $.event_id"),
            ColumnSpec("event_type", "string", "lax $.event_type"),
            ColumnSpec("val", "double", "lax $.val"),
        ],
    )
    return flat.select("user_id", "seq", "event_id", "event_type", "val").orderBy(
        "user_id", "seq"
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE walk(start, node, depth) AS (
      SELECT c_custkey AS start, c_custkey AS node, 0 AS depth
      FROM customer WHERE c_custkey < 100
      UNION ALL
      SELECT start, CAST(floor(node / 2) AS BIGINT) AS node, depth + 1 AS depth
      FROM walk WHERE node > 1
    )
    SELECT start,
           CAST(count(*) AS BIGINT)  AS chain_len,
           CAST(sum(node) AS BIGINT) AS path_sum,
           CAST(max(depth) AS BIGINT) AS max_depth
    FROM walk
    GROUP BY start
    ORDER BY start
"""


@REG.add("recursive_cte_walk", _RECURSIVE_SQL)
def recursive_cte_walk(spark: SparkSession, sf: str) -> DataFrame:
    """WITH RECURSIVE (grammar SqlBase.g4 queryTerm recursion; Trino
    supports linear recursive CTEs): ancestor walk k -> floor(k/2) -> ... 1
    over customer keys — Spark 4 executes the recursion natively (iterative
    union with a loop guard), DuckDB runs the identical SQL as oracle."""
    from trino_spark.queries.base import views

    views(spark, sf, "customer")
    return spark.sql(_RECURSIVE_SQL)


@REG.add(
    "dialect_array_combinatorics",
    """
    WITH toks AS (
      SELECT doc_id, list_slice(string_split(text, ' '), 1, 6) AS w
      FROM documents WHERE doc_id < 30
    )
    SELECT doc_id,
           array_to_string(list_transform(
             list_transform(generate_series(1, greatest(len(w) - 1, 1)),
                            i -> list_slice(w, CAST(i AS INT), CAST(i + 1 AS INT))),
             g -> array_to_string(g, '_')), '|') AS bigrams,
           array_to_string(list_transform(
             flatten(list_transform(generate_series(1, len(w) - 1),
               i -> list_transform(generate_series(i + 1, len(w)),
                 j -> [w[CAST(i AS INT)], w[CAST(j AS INT)]]))),
             g -> array_to_string(g, '_')), '|') AS pairs
    FROM toks
    ORDER BY doc_id
    """,
)
def dialect_array_combinatorics(spark: SparkSession, sf: str) -> DataFrame:
    """ngrams / combinations (ArrayNgramsFunction.java,
    ArrayCombinationsFunction.java) as dialect templates over higher-order
    expressions; oracle recomputes both with DuckDB list lambdas."""
    from trino_spark.dialect import TrinoEngine

    eng = TrinoEngine(spark, sf)
    return eng.sql(
        """
        SELECT doc_id,
               array_join(transform(ngrams(w, 2), g -> array_join(g, '_')), '|') AS bigrams,
               array_join(transform(combinations(w, 2), g -> array_join(g, '_')), '|') AS pairs
        FROM (SELECT doc_id, slice(split(text, ' '), 1, 6) AS w
              FROM documents WHERE doc_id < 30)
        ORDER BY doc_id
        """
    )


@REG.add(
    "variant_shred",
    """
    SELECT event_type,
           CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT type (spi/type/VariantType.java, spi/block/VariantBlock.java
    -> Spark 4 VariantType): semi-structured props with HOT FIELDS SHREDDED
    via a typed from_json projection (what a 100 TB pipeline does at ingest
    — variant_get(parse_json(...)) per row measured 28x slower, PERF.md r2);
    ad-hoc VARIANT access stays available and oracle-checked in the
    sibling `variant_get_path` query. Oracle shreds the same field with
    DuckDB JSON operators."""
    from trino_spark.queries.base import views

    views(spark, sf, "events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(sum(from_json(props, 'struct<k:int>').k) AS BIGINT) AS k_sum,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@REG.add(
    "variant_get_path",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER)                       AS k,
           CAST(json_type(props::JSON) = 'OBJECT' AS BOOLEAN)   AS is_obj,
           CAST(props->>'$.missing' AS INTEGER)                 AS missing_f
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def variant_get_path(spark: SparkSession, sf: str) -> DataFrame:
    """The VARIANT surface itself (Spark 4 VariantType; reference: Trino's
    json type + json_extract, JsonFunctions.java): parse_json once per row,
    typed variant_get path extraction, is_variant_object, and NULL-safe
    missing-path semantics — bounded slice, ad-hoc-exploration shape. The
    hot-field aggregation path is `variant_shred` (from_json at ingest)."""
    from trino_spark.queries.base import views

    views(spark, sf, "events")
    return spark.sql(
        """
        WITH v AS (
          SELECT event_id, parse_json(props) AS pv
          FROM events WHERE event_id < 2000
        )
        SELECT event_id,
               variant_get(pv, '$.k', 'int')                    AS k,
               startswith(schema_of_variant(pv), 'OBJECT')      AS is_obj,
               variant_get(pv, '$.missing', 'int')              AS missing_f
        FROM v
        ORDER BY event_id
        """
    )


@REG.add(
    "skew_salted_join",
    """
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 4) AS total
    FROM events e JOIN (
      SELECT DISTINCT event_type FROM events WHERE event_type <> 'view'
    ) keep ON e.event_type = keep.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe equi-join (operators/skew.salted_join — the manual analog
    of Trino's SkewedPartitionRebalancer.java and AQE skew splitting):
    event_type is a pathologically low-NDV hot key, so the small side is
    replicated across salt buckets and the big side scatters uniformly —
    no single reducer sees a whole hot key. Oracle is the plain join."""
    from trino_spark.operators.skew import salted_join

    e = t(spark, sf, "events")
    keep = e.filter(F.col("event_type") != "view").select("event_type").distinct()
    joined = salted_join(e, keep, on="event_type", num_salts=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .orderBy("event_type")
    )


@REG.add(
    "ctas_insert_roundtrip",
    """
    WITH base AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderpriority
    ),
    extra AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
    FROM (SELECT * FROM base UNION ALL SELECT * FROM extra) u
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ctas_insert_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """TableWriter/TableFinish parity (TableWriterOperator.java,
    TableFinishOperator.java): CTAS an aggregate to parquet, INSERT INTO
    (append) a second batch, read the table back and re-aggregate. The
    oracle computes the same result without the write/read hop, so the
    round-trip (committer, schema, append semantics) is value-checked."""
    import os
    import shutil

    from trino_spark import writes

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    agg_cols = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"),
    ]
    o = t(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") % 2 == 0).groupBy("o_orderpriority").agg(*agg_cols)
    extra = o.filter(F.col("o_orderkey") % 2 == 1).groupBy("o_orderpriority").agg(*agg_cols)
    path = os.path.join(repo, "spark-warehouse", "ctas_roundtrip")
    shutil.rmtree(path, ignore_errors=True)
    writes.ctas(base, path)
    writes.insert_into(extra, path)
    return (
        writes.read_back(spark, path)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@REG.add(
    "partition_overwrite_roundtrip",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def partition_overwrite_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """TableMutationOperator parity (partition-scoped DELETE+INSERT):
    events written partitioned by event_type, then ONLY the 'error'
    partition overwritten with flagged rows (dynamic partition overwrite —
    other partitions untouched). Reading back must show the flag exactly
    on the rewritten partition; oracle derives the same from the source."""
    import os
    import shutil

    from trino_spark import writes

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    e = t(spark, sf, "events").select("event_id", "event_type")
    path = os.path.join(repo, "spark-warehouse", "part_overwrite")
    shutil.rmtree(path, ignore_errors=True)
    e.withColumn("flagged", F.lit(0)).write.partitionBy("event_type").mode("overwrite").parquet(path)
    patched = (
        e.filter(F.col("event_type") == "error").withColumn("flagged", F.lit(1))
    )
    writes.overwrite_partitions(patched, path, ["event_type"])
    return (
        writes.read_back(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("flagged").cast("long").alias("n_flagged"),
        )
        .orderBy("event_type")
    )


@REG.add(
    "bucketed_join_roundtrip",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_li,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 5 = 0
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def bucketed_join_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed CTAS -> shuffle-free co-located join
    (ConnectorBucketNodeMap / Hive bucketed tables): orders and lineitem
    CTAS'd bucketed on the join key, joined WITHOUT an Exchange on either
    side (asserted in tests/test_writes_streaming.py), result
    value-checked against the plain join. At 100 TB this turns the
    repeated fact-to-fact join into a local merge."""
    from trino_spark import writes

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_orderpriority"
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")
    writes.ctas_bucketed(o, "bjr_orders", 8, ["o_orderkey"], ["o_orderkey"])
    writes.ctas_bucketed(li, "bjr_lineitem", 8, ["l_orderkey"], ["l_orderkey"])
    ob = spark.table("bjr_orders")
    lb = spark.table("bjr_lineitem")
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_li"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("price_cents"),
        )
        .orderBy("o_orderpriority")
    )


@REG.add("sketch_tdigest_quantiles", None)
def sketch_tdigest_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """t-digest columns (TDigestFunctions.java:31 tdigest_agg / merge /
    values_at_quantiles): per-returnflag digests built with partition-local
    partials (raw rows never shuffle) then digest-only merge; q50/q90/q99
    read per group plus a merged ALL row. Digest depends on partition
    order -> rows-only; rank-error and merge-equivalence pinned in
    tests/test_tdigest.py."""
    from trino_spark.operators import tdigest as td

    li = t(spark, sf, "lineitem")
    per = td.tdigest_agg(li, ["l_returnflag"], "l_extendedprice")
    qs = [0.5, 0.9, 0.99]
    per_out = td.with_quantiles(per, qs, ["l_returnflag"])
    merged = td.merge_digests(
        per.withColumn("l_returnflag", F.lit("ALL")), ["l_returnflag"]
    )
    all_out = td.with_quantiles(merged, qs, ["l_returnflag"])
    return per_out.unionByName(all_out).orderBy("l_returnflag")


@REG.add(
    "zorder_write_roundtrip",
    """
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 60
    """,
)
def zorder_write_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order clustered write (operators/zorder.py — the OPTIMIZE ZORDER
    BY layout lever Trino delegates to Iceberg/Delta): lineitem written
    along the Morton curve of (l_partkey, l_suppkey), read back, and a
    2-D range filter aggregated. The oracle computes the same aggregate
    straight off the source — the layout must be value-preserving — while
    tests/test_zorder.py proves the pruning benefit (fewer files touched
    than a linear sort)."""
    import os
    import shutil

    from trino_spark.operators import zorder

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(repo, "spark-warehouse", "zorder_rt")
    shutil.rmtree(path, ignore_errors=True)
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    zorder.write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(path)
    return back.filter(
        F.col("l_partkey").between(100, 400) & F.col("l_suppkey").between(10, 60)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("cents"),
    )


@REG.add(
    "json_table_nested",
    """
    SELECT user_id, event_type,
           CAST(event_id AS BIGINT) AS event_id,
           round(value, 6) AS val
    FROM events WHERE user_id < 30
    ORDER BY user_id, event_type, event_id
    """,
)
def json_table_nested(spark: SparkSession, sf: str) -> DataFrame:
    """JSON_TABLE NESTED PATH (grammar SqlBase.g4 jsonTableColumn ->
    NESTED; reference main/operator/table/json/ nested plan): events pack
    into one JSON doc per user with a per-type nested array, then NESTED
    PATH unpacks both levels (PLAIN LEFT OUTER lateral). Pack->unpack must
    be the identity, so the oracle is the plain relational projection."""
    from trino_spark.operators.json_table import ColumnSpec, NestedSpec, json_table

    ev = (
        t(spark, sf, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "event_type", "event_id", F.round("value", 6).alias("val"))
    )
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.sort_array(F.collect_list(F.struct("event_id", "val"))).alias("evs")
    )
    packed = per_type.groupBy("user_id").agg(
        F.to_json(
            F.struct(
                F.sort_array(F.collect_list(F.struct("event_type", "evs"))).alias("types")
            )
        ).alias("doc")
    )
    flat = json_table(
        packed,
        "doc",
        "lax $.types[*]",
        [
            ColumnSpec("event_type", "string", path="$.event_type"),
            NestedSpec(
                "lax $.evs[*]",
                (
                    ColumnSpec("event_id", "bigint", path="$.event_id"),
                    ColumnSpec("val", "double", path="$.val"),
                ),
            ),
        ],
    )
    return flat.select("user_id", "event_type", "event_id", "val").orderBy(
        "user_id", "event_type", "event_id"
    )
