"""Driver-visible queries executed through the Trino-dialect layer: the SQL
text below is Trino dialect (strpos/date_diff/UNNEST/FETCH...WITH TIES),
run via TrinoEngine.sql -> translate -> spark.sql."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_spark.dialect import TrinoEngine
from trino_spark.queries.base import QueryRegistry

REG = QueryRegistry()


def _run(spark: SparkSession, sf: str, trino_sql: str) -> DataFrame:
    return TrinoEngine(spark, sf).sql(trino_sql)


@REG.add(
    "dialect_q6_trino",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01'
      AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def dialect_q6_trino(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 stated in Trino dialect, through the translation layer."""
    return _run(
        spark,
        sf,
        """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1994-01-01'
          AND date_diff('day', l_shipdate, DATE '1995-01-01') > 0
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    )


@REG.add(
    "dialect_datetime_fns",
    """
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS age_days,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def dialect_datetime_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Trino datetime surface: unit-first date_diff + MySQL-pattern
    date_format, translated to timestampdiff/date_format."""
    return _run(
        spark,
        sf,
        """
        SELECT o_orderkey,
               date_diff('day', DATE '1995-01-01', o_orderdate) AS age_days,
               date_format(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS ym
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
        """,
    )


@REG.add(
    "dialect_unnest_ordinality",
    """
    SELECT n_name, w, CAST(o AS BIGINT) AS o FROM (
      SELECT n_name,
             unnest(string_split(n_name, ' ')) AS w,
             generate_subscripts(string_split(n_name, ' '), 1) AS o
      FROM nation) u
    ORDER BY n_name, o
    """,
)
def dialect_unnest_ordinality(spark: SparkSession, sf: str) -> DataFrame:
    """Trino UNNEST ... WITH ORDINALITY translated to a LATERAL VIEW
    inline(transform(...)) that preserves 1-based ordinality."""
    return _run(
        spark,
        sf,
        """
        SELECT n_name, w, o FROM nation
        CROSS JOIN UNNEST(split(n_name, ' ')) WITH ORDINALITY AS t(w, o)
        ORDER BY n_name, o
        """,
    )


@REG.add(
    "dialect_fetch_ties",
    """
    SELECT o_orderpriority, o_orderdate
    FROM (SELECT o_orderpriority, o_orderdate,
                 rank() OVER (ORDER BY o_orderdate) AS rk FROM orders) t
    WHERE rk <= 10 ORDER BY o_orderdate
    """,
)
def dialect_fetch_ties(spark: SparkSession, sf: str) -> DataFrame:
    """FETCH FIRST 10 ROWS WITH TIES via the rank() rewrite (Trino:
    ImplementLimitWithTies.java)."""
    return _run(
        spark,
        sf,
        """
        SELECT o_orderpriority, o_orderdate FROM orders
        ORDER BY o_orderdate FETCH FIRST 10 ROWS WITH TIES
        """,
    )


@REG.add(
    "dialect_sql_json",
    """
    SELECT doc_id,
           json_extract_string(props, '$.k') AS v,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
           printf('%s#%d', lang, doc_id) AS tagged
    FROM (SELECT d.doc_id, d.lang,
                 concat('{"k": "', d.lang, '"}') AS props
          FROM documents d WHERE d.doc_id < 200)
    ORDER BY doc_id
    """,
)
def dialect_sql_json(spark: SparkSession, sf: str) -> DataFrame:
    """SQL/JSON-2016 trio (Trino scalar/json/ JsonValue/JsonQuery/JsonExists,
    grammar JsonPath.g4) + printf-style format (FormatFunction.java:78),
    through the dialect translation (json_value -> get_json_object with the
    lax-prefix stripped)."""
    return _run(
        spark,
        sf,
        """
        SELECT doc_id,
               json_value(props, 'lax $.k') AS v,
               json_exists(props, 'lax $.k') AS has_k,
               format('%s#%d', lang, doc_id) AS tagged
        FROM (SELECT d.doc_id, d.lang,
                     concat('{"k": "', d.lang, '"}') AS props
              FROM documents d WHERE d.doc_id < 200)
        ORDER BY doc_id
        """,
    )


@REG.add(
    "dialect_sql_routine",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charged,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity * 2 > 60
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def dialect_sql_routine(spark: SparkSession, sf: str) -> DataFrame:
    """SQL routines (CREATE FUNCTION ... RETURN expr; reference
    SqlRoutineAnalyzer.java / SqlRoutinePlanner inlining, docs udf/sql.md):
    routines are inlined as macros before dialect translation, so the call
    costs nothing at scale — the oracle is the hand-inlined SQL."""
    eng = TrinoEngine(spark, sf)
    eng.sql(
        "CREATE FUNCTION charge(price DOUBLE, disc DOUBLE, tax DOUBLE) "
        "RETURNS DOUBLE RETURN price * (1 - disc) * (1 + tax)"
    )
    eng.sql("CREATE FUNCTION doubled(x DOUBLE) RETURNS DOUBLE RETURN x * 2")
    return eng.sql(
        """
        SELECT l_returnflag,
               round(sum(charge(l_extendedprice, l_discount, l_tax)), 2) AS charged,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        WHERE doubled(l_quantity) > 60
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@REG.add(
    "dialect_at_time_zone",
    """
    SELECT event_id,
           CAST(date_trunc('hour', ts) AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS VARCHAR) AS ny_wall
    FROM events WHERE event_id < 100
    ORDER BY event_id
    """,
)
def dialect_at_time_zone(spark: SparkSession, sf: str) -> DataFrame:
    """AT TIME ZONE (grammar SqlBase.g4; DateTimeFunctions.java at_timezone):
    UTC instants rendered as America/New_York wall clock. The dialect layer
    rewrites the postfix syntax to convert_timezone; DuckDB's oracle uses
    its Postgres-style double AT TIME ZONE to produce the same naive wall
    clock, independent of either engine's session zone."""
    return _run(
        spark,
        sf,
        """
        SELECT event_id,
               CAST(date_trunc('hour', ts) AT TIME ZONE 'America/New_York' AS VARCHAR) AS ny_wall
        FROM events WHERE event_id < 100
        ORDER BY event_id
        """,
    )


@REG.add(
    "dialect_routine_control",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000.0 THEN 'high'
                WHEN c_acctbal > 0 THEN 'mid'
                ELSE 'low' END AS tier,
           CAST((c_custkey % 20) * (c_custkey % 20 + 1) / 2 AS BIGINT) AS tri,
           CAST(list_sum(list_transform(regexp_extract_all(CAST(c_custkey AS VARCHAR), '\\d'),
                                        d -> CAST(d AS INTEGER))) AS BIGINT) AS dsum
    FROM customer
    WHERE c_custkey < 500
    ORDER BY c_custkey
    """,
)
def dialect_routine_control(spark: SparkSession, sf: str) -> DataFrame:
    """SQL routine control flow (grammar SqlBase.g4:1104,
    SqlRoutineCompiler.java:108) + LANGUAGE PYTHON functions
    (plugin/trino-functions-python PythonEngine.java):

    - `tier`: BEGIN/DECLARE/IF body — compiles to an inlined CASE
      expression (fast path, zero per-row Python; routine_body.py tier 1)
    - `sum_to`: WHILE loop -> interpreted per row as a registered UDF
      (tier 2); oracle uses the closed form n(n+1)/2
    - `digit_sum`: LANGUAGE PYTHON AS $$...$$ handler."""
    eng = TrinoEngine(spark, sf)
    eng.sql(
        """
        CREATE FUNCTION tier(bal DOUBLE) RETURNS VARCHAR
        BEGIN
          DECLARE hi DOUBLE DEFAULT 5000.0;
          IF bal > hi THEN RETURN 'high';
          ELSEIF bal > 0 THEN RETURN 'mid';
          ELSE RETURN 'low';
          END IF;
        END
        """
    )
    eng.sql(
        """
        CREATE FUNCTION sum_to(n BIGINT) RETURNS BIGINT
        BEGIN
          DECLARE i BIGINT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 0;
          WHILE i < n DO
            SET i = i + 1;
            SET acc = acc + i;
          END WHILE;
          RETURN acc;
        END
        """
    )
    eng.sql(
        """
        CREATE FUNCTION digit_sum(x BIGINT) RETURNS BIGINT
        LANGUAGE PYTHON WITH (handler = 'dsum') AS $$
def dsum(x):
    return sum(int(d) for d in str(abs(int(x))))
$$
        """
    )
    return eng.sql(
        """
        SELECT c_custkey,
               tier(c_acctbal) AS tier,
               sum_to(c_custkey % 20) AS tri,
               digit_sum(c_custkey) AS dsum
        FROM customer
        WHERE c_custkey < 500
        ORDER BY c_custkey
        """
    )


@REG.add(
    "dialect_ptf_sequence",
    """
    WITH s AS (SELECT unnest(generate_series(1, 40)) AS n)
    SELECT n.n_nationkey, s.n AS seq_n,
           CAST(n.n_nationkey * s.n AS BIGINT) AS prod
    FROM (SELECT n_nationkey, n_name FROM nation) n
    JOIN s ON s.n = n.n_nationkey + 1
    ORDER BY n.n_nationkey
    """,
)
def dialect_ptf_sequence(spark: SparkSession, sf: str) -> DataFrame:
    """Polymorphic table functions (main/operator/table/ Sequence +
    ExcludeColumns TableFunction, grammar tableFunctionCall):
    TABLE(sequence(...)) -> range() relation with Trino's
    sequential_number column; TABLE(exclude_columns(...)) -> * EXCEPT
    projection. Oracle re-derives with generate_series."""
    eng = TrinoEngine(spark, sf)
    return eng.sql(
        """
        SELECT n.n_nationkey, s.sequential_number AS seq_n,
               CAST(n.n_nationkey * s.sequential_number AS BIGINT) AS prod
        FROM TABLE(exclude_columns(TABLE(nation), DESCRIPTOR(n_regionkey))) n
        JOIN TABLE(sequence(1, 40)) s ON s.sequential_number = n.n_nationkey + 1
        ORDER BY n.n_nationkey
        """
    )


@REG.add(
    "dialect_ptf_udtf",
    """
    SELECT n_name,
           CAST(generate_subscripts(string_split(n_name, '_'), 1) AS INTEGER) AS ordinal,
           unnest(string_split(n_name, '_')) AS value
    FROM nation
    ORDER BY n_name, ordinal
    """,
)
def dialect_ptf_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Custom PTF via Python UDTF (spi/function/table/
    ConnectorTableFunction.java; Spark 4 UDTF as the executor): the
    built-in split_to_rows table function laterally applied per nation
    row. Oracle re-derives with DuckDB unnest + generate_subscripts."""
    eng = TrinoEngine(spark, sf)
    return eng.sql(
        """
        SELECT n.n_name, s.ordinal, s.value
        FROM nation n, LATERAL TABLE(split_to_rows(n.n_name, '_')) s
        ORDER BY n.n_name, s.ordinal
        """
    )


@REG.add(
    "dialect_match_recognize",
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
             CAST(count(*) AS BIGINT) AS n_views
      FROM runs WHERE event_type = 'view'
      GROUP BY user_id, grp
    )
    SELECT v.user_id,
           CAST(row_number() OVER (PARTITION BY v.user_id ORDER BY v.srn) AS BIGINT) AS match_no,
           v.n_views,
           round(p.value, 6) AS purchase_value
    FROM view_runs v
    JOIN o p ON p.user_id = v.user_id AND p.rn = v.ern + 1 AND p.event_type = 'purchase'
    ORDER BY v.user_id, match_no
    """,
)
def dialect_match_recognize(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE through the SQL surface (grammar SqlBase.g4:448
    compiled onto the NFA operator by dialect/match_recognize_sql.py):
    the same V+ P funnel as match_recognize_funnel, but entered as a
    Trino SQL statement — clause parsing, DEFINE/MEASURES expression
    compilation, and outer-query substitution all on the hot path."""
    return _run(
        spark,
        sf,
        """
        SELECT user_id, match_no, n_views, round(purchase_value, 6) AS purchase_value
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES COUNT(V.*) AS n_views, LAST(value) AS purchase_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        )
        ORDER BY user_id, match_no
        """,
    )


@REG.add(
    "dialect_scalar_residue",
    """
    SELECT s_suppkey,
           round((p + zz / (2 * n) - z * sqrt(p * (1 - p) / n + zz / (4 * n * n)))
                 / (1 + zz / n), 6) AS wilson_lo,
           hamming('karolin', 'kathrin') AS hd,
           bit_count(CAST(249 AS BIGINT)) AS bc,
           json_extract_string('[5,10,15]', '$[2]') AS jg,
           instr('hayneedlestack', 'needle') AS ix,
           repeat('█', 3) AS bar3
    FROM (
      SELECT s_suppkey,
             CAST(s_suppkey % 50 + 10 AS DOUBLE) / 100.0 AS p,
             100.0 AS n, 1.96 AS z, 1.96 * 1.96 AS zz
      FROM supplier WHERE s_suppkey < 40
    )
    ORDER BY s_suppkey
    """,
)
def dialect_scalar_residue(spark: SparkSession, sf: str) -> DataFrame:
    """Round-2 scalar fill-ins through the dialect layer: Wilson score
    interval (template-inlined arithmetic, stays in codegen), Hamming
    distance (zip_with fold), 2-arg bit_count (masked popcount),
    json_array_get, index, bar — each recomputed independently by DuckDB's
    own spellings (hamming/bit_count/json_extract_string/instr/repeat)."""
    return _run(
        spark,
        sf,
        """
        SELECT s_suppkey,
               round(wilson_interval_lower(s_suppkey % 50 + 10, 100, 1.96), 6) AS wilson_lo,
               hamming_distance('karolin', 'kathrin') AS hd,
               bit_count(-7, 8) AS bc,
               json_array_get('[5,10,15]', 2) AS jg,
               index('hayneedlestack', 'needle') AS ix,
               bar(0.3, 10) AS bar3
        FROM supplier WHERE s_suppkey < 40
        ORDER BY s_suppkey
        """,
    )


@REG.add(
    "dialect_mr_aggregates",
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
             sum(value) AS sv, avg(value) AS av, min(value) AS mv, max(value) AS xv
      FROM runs WHERE event_type = 'view'
      GROUP BY user_id, grp
    )
    SELECT v.user_id,
           CAST(row_number() OVER (PARTITION BY v.user_id ORDER BY v.srn) AS BIGINT) AS match_no,
           v.n_views,
           round(v.sv, 6) AS sum_v, round(v.av, 6) AS avg_v,
           round(v.mv, 6) AS min_v, round(v.xv, 6) AS max_v
    FROM view_runs v
    JOIN o p ON p.user_id = v.user_id AND p.rn = v.ern + 1 AND p.event_type = 'purchase'
    ORDER BY v.user_id, match_no
    """,
)
def dialect_mr_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """Row-pattern AGGREGATE measures (reference: pattern aggregations in
    MEASURES, core/.../rowpattern/ MeasureComputation + grammar
    SqlBase.g4 patternRecognition): SUM/AVG/MIN/MAX over label-qualified
    variable rows, compiled by dialect/match_recognize_sql.py onto the NFA
    operator. Oracle restates each aggregate over the island-grouped view
    runs."""
    return _run(
        spark,
        sf,
        """
        SELECT user_id, match_no, n_views,
               round(sum_v, 6) AS sum_v, round(avg_v, 6) AS avg_v,
               round(min_v, 6) AS min_v, round(max_v, 6) AS max_v
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES COUNT(V.*) AS n_views, SUM(V.value) AS sum_v,
                   AVG(V.value) AS avg_v, MIN(V.value) AS min_v,
                   MAX(V.value) AS max_v
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        )
        ORDER BY user_id, match_no
        """,
    )


@REG.add(
    "dialect_quantified_row",
    """
    WITH mx AS (SELECT max(n_regionkey) AS m FROM nation)
    SELECT n.n_nationkey,
           round(CAST(CAST(12.345 AS DECIMAL(5, 3)) * 2 AS DOUBLE), 3) AS dec_lit,
           struct_pack(id := n.n_nationkey, nm := n.n_name)['nm'] AS row_nm
    FROM nation n, mx
    WHERE n.n_nationkey > mx.m
    ORDER BY n.n_nationkey
    OFFSET 5 LIMIT 4
    """,
)
def dialect_quantified_row(spark: SparkSession, sf: str) -> DataFrame:
    """Round-2 grammar fill-ins end-to-end: `> ALL (subquery)` quantified
    comparison (aggregate rewrite), typed DECIMAL literal (precision
    inference), ROW constructor + cast field access, and Trino's
    OFFSET-before-LIMIT clause order. DuckDB re-states each with its own
    native spellings (struct_pack, max CTE, plain OFFSET)."""
    return _run(
        spark,
        sf,
        """
        SELECT n_nationkey,
               round(CAST(DECIMAL '12.345' * 2 AS DOUBLE), 3) AS dec_lit,
               CAST(ROW(n_nationkey, n_name) AS ROW(id INT, nm VARCHAR)).nm AS row_nm
        FROM nation
        WHERE n_nationkey > ALL (SELECT n_regionkey FROM nation)
        ORDER BY n_nationkey
        OFFSET 5 LIMIT 4
        """,
    )


@REG.add(
    "dialect_json_table",
    """
    SELECT user_id,
           CAST(seq AS BIGINT) AS seq,
           CAST(event_id AS BIGINT) AS event_id,
           round(value, 6) AS val
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS seq
      FROM events WHERE user_id < 40
    )
    ORDER BY user_id, seq
    """,
)
def dialect_json_table(spark: SparkSession, sf: str) -> DataFrame:
    """JSON_TABLE through the SQL surface (grammar SqlBase.g4 jsonTable ->
    dialect/json_table_sql.py -> operators/json_table.py): events pack to
    one JSON document per user, then the SQL clause flattens them back
    with FOR ORDINALITY + typed PATH columns. Identity round-trip, so the
    oracle is the relational projection."""
    from pyspark.sql import functions as F

    from trino_spark.dialect import TrinoEngine
    from trino_spark.queries.base import t as _t

    eng = TrinoEngine(spark, sf_dir=sf)
    ev = (
        _t(spark, sf, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_id", F.round("value", 6).alias("val"))
    )
    ev.groupBy("user_id").agg(
        F.to_json(
            F.struct(F.sort_array(F.collect_list(F.struct("event_id", "val"))).alias("evs"))
        ).alias("doc")
    ).createOrReplaceTempView("jt_packed_events")
    return eng.sql(
        """
        SELECT user_id, CAST(seq AS BIGINT) AS seq,
               CAST(event_id AS BIGINT) AS event_id, val
        FROM jt_packed_events p, JSON_TABLE(p.doc, 'lax $.evs[*]'
          COLUMNS (seq FOR ORDINALITY,
                   event_id BIGINT PATH '$.event_id',
                   val DOUBLE PATH '$.val'))
        ORDER BY user_id, seq
        """
    )


@REG.add(
    "dialect_timetz",
    """
    WITH t AS (
      SELECT n_nationkey AS k,
             6 + (n_nationkey % 12)            AS hh,
             (n_nationkey % 4) * 15            AS mi,
             CAST((n_nationkey % 5) * 30 - 60 AS INTEGER) AS offm
      FROM nation
    )
    SELECT CAST(k AS BIGINT) AS k,
           printf('%02d:%02d:00.000%s%02d:%02d', hh, mi,
                  CASE WHEN offm < 0 THEN '-' ELSE '+' END,
                  abs(offm) // 60, abs(offm) % 60)                    AS canon,
           CAST((CAST(hh * 3600 + mi * 60 AS BIGINT) * 1000000000
                 - offm * CAST(60000000000 AS BIGINT)
                 + 86400 * CAST(1000000000 AS BIGINT) * 2)
                % (86400 * CAST(1000000000 AS BIGINT)) AS BIGINT)     AS utc_nanos,
           printf('%02d:%02d:00.000+05:45',
                  ((hh * 3600 + mi * 60
                    - offm * 60 + 5 * 3600 + 45 * 60 + 2 * 86400) % 86400) // 3600,
                  (((hh * 3600 + mi * 60
                    - offm * 60 + 5 * 3600 + 45 * 60 + 2 * 86400) % 86400) % 3600) // 60)
                                                                      AS in_kathmandu,
           CAST(hh AS BIGINT) AS hour_field
    FROM t
    ORDER BY k
    """,
)
def dialect_timetz(spark: SparkSession, sf: str) -> DataFrame:
    """TIME WITH TIME ZONE (TimeWithTimeZoneType.java; round-5 closure of
    the documented type gap): offset-bearing TIME literals, CAST from
    varchar, UTC-normalized comparison key, AT TIME ZONE re-offsetting,
    and field extraction — all through TrinoEngine.sql on the canonical
    varchar carrier. (`AT TIME ZONE` binds to the timetz carrier for
    inline TIME '...' literals; a COLUMN of the carrier type uses the
    explicit timetz_at_time_zone spelling — the token rewriter cannot
    type-infer columns, same documented split as the WKT geometry
    carrier.) The oracle restates every value with integer
    arithmetic and printf (offsets are multiples of 15 minutes, so all
    values are exact)."""
    from trino_spark.queries.base import engine_for

    return engine_for(spark, sf).sql(
        """
        WITH t AS (
          SELECT n_nationkey AS k,
                 CAST(concat(
                   lpad(CAST(6 + (n_nationkey % 12) AS VARCHAR), 2, '0'), ':',
                   lpad(CAST((n_nationkey % 4) * 15 AS VARCHAR), 2, '0'), ':00',
                   CASE WHEN (n_nationkey % 5) * 30 - 60 < 0 THEN '-' ELSE '+' END,
                   lpad(CAST(CAST(floor(abs((n_nationkey % 5) * 30 - 60) / 60) AS INTEGER) AS VARCHAR), 2, '0'), ':',
                   lpad(CAST(abs((n_nationkey % 5) * 30 - 60) % 60 AS VARCHAR), 2, '0')
                 ) AS TIME WITH TIME ZONE) AS tv
          FROM nation
        )
        SELECT CAST(k AS BIGINT) AS k,
               tv AS canon,
               timetz_to_utc_nanos(tv) AS utc_nanos,
               timetz_at_time_zone('+05:45', tv) AS in_kathmandu,
               timetz_hour(tv) AS hour_field
        FROM t
        ORDER BY k
        """
    )


@REG.add(
    "dialect_sketch_twophase",
    """
    SELECT o_orderpriority AS k, CAST(cnt AS BIGINT) AS cnt
    FROM (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1)
    ORDER BY k
    """,
)
def dialect_sketch_twophase(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end value check of the round-6 two-phase GROUPED_AGG
    rewrite (rewrites.py _rewrite_sketch_twophase): approx_most_frequent
    with capacity >= distinct values is EXACT, so partial maps per scan
    partition + merge_approx_most_frequent must reproduce the plain
    GROUP BY counts bit-for-bit. The map result is exploded to rows so
    the driver canonicalizer can hash it."""
    from pyspark.sql import functions as F

    from trino_spark.queries.base import engine_for

    m = engine_for(spark, sf).sql(
        "SELECT approx_most_frequent(10, o_orderpriority, 1000) AS m FROM orders"
    )
    return (
        m.select(F.explode("m").alias("k", "cnt"))
        .select("k", F.col("cnt").cast("long").alias("cnt"))
        .orderBy("k")
    )


@REG.add(
    "dialect_groups_frame",
    """
    WITH g AS (
      SELECT o_custkey, o_orderdate,
             sum(o_totalprice) AS gsum, count(*) AS gcnt
      FROM orders WHERE o_custkey < 120
      GROUP BY o_custkey, o_orderdate
    ),
    w AS (
      SELECT o_custkey, o_orderdate,
             coalesce(lag(gsum) OVER (PARTITION BY o_custkey ORDER BY o_orderdate), 0)
               + gsum
               + coalesce(lead(gsum) OVER (PARTITION BY o_custkey ORDER BY o_orderdate), 0)
               AS neighborhood_value,
             sum(gcnt) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                             ROWS UNBOUNDED PRECEDING) AS peers_to_date
      FROM g
    )
    SELECT o.o_custkey, o.o_orderkey,
           CAST(w.neighborhood_value AS DOUBLE) AS neighborhood_value,
           CAST(w.peers_to_date AS BIGINT) AS peers_to_date
    FROM orders o JOIN w ON o.o_custkey = w.o_custkey AND o.o_orderdate = w.o_orderdate
    WHERE o.o_custkey < 120
    ORDER BY o.o_custkey, o.o_orderkey
    LIMIT 60
    """,
)
def dialect_groups_frame(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPS window frames (SQL:2011; round-6 SQL-surface closure of
    the §2.5 gap — Spark has no GROUPS mode, the dialect rewrites to a
    RANGE frame over dense_rank). DuckDB executes GROUPS natively, so
    the oracle is the identical SQL — a true cross-engine differential
    including the duplicate-order-date group semantics."""
    from trino_spark.queries.base import engine_for

    return engine_for(spark, sf).sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
               ) AS DOUBLE) AS neighborhood_value,
               CAST(count(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS peers_to_date
        FROM orders WHERE o_custkey < 120
        ORDER BY o_custkey, o_orderkey
        LIMIT 60
        """
    )
