"""Scalar-function coverage queries (SURVEY.md §2.8): string, regex, math,
datetime, JSON, conditional/try, array/higher-order — each oracle-checked
against DuckDB's same-named (or equivalent) functions.

DuckDB deltas handled in the oracle SQL:
- no width_bucket -> closed-form floor arithmetic;
- regexp_replace needs the 'g' flag to match Spark's replace-all;
- date_trunc returns DATE for day+ units -> CAST to TIMESTAMP;
- no regexp_count -> len(regexp_split_to_array)-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_spark.functions import strings as ts_str
from trino_spark.functions import vectors as ts_vec
from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()


@REG.add(
    "func_string_ops",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT)        AS n_len,
           upper(substring(text, 1, 12))       AS head_upper,
           reverse(lang)                       AS lang_rev,
           replace(source, 'src', 'origin_')   AS src_renamed,
           CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
           lpad(lang, 5, '*')                  AS lang_pad,
           concat_ws('|', lang, source)        AS lang_src,
           translate(lang, 'aeiou', 'AEIOU')   AS lang_vowels,
           split_part(source, 'rc', 2)         AS src_num,
           CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_en,
           md5(text)                           AS text_md5,
           trim(concat('  ', lang, '  '))      AS lang_trim
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def func_string_ops(spark: SparkSession, sf: str) -> DataFrame:
    """String library parity (Trino: StringFunctions.java:70)."""
    return (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_len"),
            F.upper(F.substring("text", 1, 12)).alias("head_upper"),
            F.reverse(F.col("lang")).alias("lang_rev"),
            F.replace(F.col("source"), F.lit("src"), F.lit("origin_")).alias("src_renamed"),
            F.instr("text", "data").cast("long").alias("pos_data"),
            F.lpad("lang", 5, "*").alias("lang_pad"),
            F.concat_ws("|", "lang", "source").alias("lang_src"),
            F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels"),
            ts_str.split_part("source", "rc", 2).alias("src_num"),
            F.levenshtein("lang", F.lit("en")).cast("long").alias("lev_en"),
            F.md5("text").alias("text_md5"),
            F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
        )
        .orderBy("doc_id")
    )


@REG.add(
    "func_regex_ops",
    """
    SELECT doc_id,
           regexp_extract(text, '(s[a-z]+)', 1)                       AS first_s_word,
           regexp_replace(text, '[aeiou]', '_', 'g')                  AS devoweled_head,
           CAST(len(regexp_split_to_array(text, 'data')) - 1 AS BIGINT) AS n_data,
           regexp_matches(text, '^[a-z ]+$')                          AS is_lower
    FROM (SELECT doc_id, substring(text, 1, 40) AS text FROM documents WHERE doc_id < 100) d
    ORDER BY doc_id
    """,
)
def func_regex_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Regex library (Trino: JoniRegexpFunctions.java:48 — like/extract/
    replace/split/count)."""
    d = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.substring("text", 1, 40).alias("text"))
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"(s[a-z]+)", 1).alias("first_s_word"),
        F.regexp_replace("text", r"[aeiou]", "_").alias("devoweled_head"),
        F.regexp_count("text", F.lit("data")).cast("long").alias("n_data"),
        F.col("text").rlike(r"^[a-z ]+$").alias("is_lower"),
    ).orderBy("doc_id")


@REG.add(
    "func_math_ops",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                       AS abs_c,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS ceil_k,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
           floor((CAST(round(l_extendedprice * 100, 0) AS BIGINT) + 5) / 10) / 10 AS round_1,
           round(sqrt(l_quantity), 6)                   AS sqrt_q,
           round(ln(l_extendedprice), 6)                AS ln_p,
           round(log10(l_extendedprice), 6)             AS log10_p,
           round(exp(l_discount), 6)                    AS exp_d,
           round(power(l_quantity, 2.0), 6)             AS q_sq,
           mod(CAST(l_quantity AS BIGINT), 7)           AS qty_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE)      AS sgn,
           greatest(l_quantity, 25.0)                   AS hi,
           least(l_quantity, 25.0)                      AS lo,
           CAST(CASE WHEN l_quantity < 0 THEN 0
                     WHEN l_quantity >= 50 THEN 6
                     ELSE 1 + floor(l_quantity / 10) END AS BIGINT) AS qty_bucket
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def func_math_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Math library (Trino: MathFunctions.java:79). qty_bucket is
    width_bucket(q, 0, 50, 5) — DuckDB lacks width_bucket, so the oracle
    spells out the closed form; Spark uses the builtin."""
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_c"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("ceil_k"),
        F.floor(F.col("l_extendedprice") / 1000).alias("floor_k"),
        # round(x, 1) with a pinned HALF-UP tie policy: the price is exact
        # cents, so recover the integer cents and do the rounding in exact
        # integer math on BOTH sides (Spark's double round goes through
        # BigDecimal shortest-repr, DuckDB through libm — they disagree on
        # .x5 ties otherwise).
        (F.floor((F.round(F.col("l_extendedprice") * 100, 0).cast("long") + 5) / 10) / 10).alias(
            "round_1"
        ),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("q_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.greatest("l_quantity", F.lit(25.0)).alias("hi"),
        F.least("l_quantity", F.lit(25.0)).alias("lo"),
        F.width_bucket("l_quantity", F.lit(0.0), F.lit(50.0), F.lit(5)).alias("qty_bucket"),
    ).orderBy("l_orderkey", "l_linenumber")


@REG.add(
    "func_datetime_ops",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)      AS month_start,
           CAST(extract(year FROM o_orderdate) AS INTEGER)          AS yr,
           CAST(extract(month FROM o_orderdate) AS INTEGER)         AS mo,
           CAST(extract(day FROM o_orderdate) AS INTEGER)           AS dom,
           CAST(extract(quarter FROM o_orderdate) AS INTEGER)       AS qtr,
           o_orderdate + INTERVAL 90 DAY                            AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           strftime(o_orderdate, '%Y-%m-%d')                        AS iso_day,
           CAST(epoch(o_orderdate) AS BIGINT)                       AS unix_ts
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def func_datetime_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Datetime library (Trino: DateTimeFunctions.java:72): trunc/extract/
    interval arithmetic/diff/format/epoch. iso_day goes through our
    MySQL-pattern translator (datetimes.mysql_to_java)."""
    from trino_spark.functions import datetimes as dtf

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        dtf.date_add("day", 90, "o_orderdate").alias("due_date"),
        dtf.date_diff("day", F.lit("1995-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_since_95"
        ),
        dtf.format_datetime("o_orderdate", "%Y-%m-%d").alias("iso_day"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
    ).orderBy("o_orderkey")


@REG.add(
    "func_json_ops",
    """
    SELECT event_type,
           avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_k,
           CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_k,
           min(json_extract_string(props, '$.k'))                 AS min_k_str
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def func_json_ops(spark: SparkSession, sf: str) -> DataFrame:
    """JSON path extraction (Trino: JsonFunctions.java:54 json_extract_scalar)
    via get_json_object, aggregated to keep the check value-stable."""
    e = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.groupBy("event_type")
        .agg(
            F.avg(k.cast("double")).alias("avg_k"),
            F.count(k).alias("n_k"),
            F.min(k).alias("min_k_str"),
        )
        .orderBy("event_type")
    )


@REG.add(
    "func_try_cast",
    """
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER)                       AS lang_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER)   AS chars_int,
           coalesce(TRY_CAST(lang AS INTEGER), -1)         AS lang_or_neg1
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def func_try_cast(spark: SparkSession, sf: str) -> DataFrame:
    """TRY_CAST / try()-style null-on-error semantics (Trino:
    TryCastFunction.java, TryFunction.java:40)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    lang_int = F.col("lang").try_cast("int")
    return d.select(
        "doc_id",
        lang_int.alias("lang_int"),
        F.col("n_chars").cast("string").try_cast("int").alias("chars_int"),
        F.coalesce(lang_int, F.lit(-1)).alias("lang_or_neg1"),
    ).orderBy("doc_id")


@REG.add(
    "func_array_hof",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                                  AS dim,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)), 9) AS sq_sum,
           round(list_max(embedding::DOUBLE[]), 9)                          AS max_v,
           round(list_min(embedding::DOUBLE[]), 9)                          AS min_v,
           round(list_sum(list_filter(embedding::DOUBLE[], x -> x > 0)), 9) AS pos_sum,
           array_to_string(list_transform(list_sort(list_transform(embedding[1:4]::DOUBLE[], x -> round(x, 3) + 0.0)), x -> printf('%.3f', x)), ',') AS head_sorted
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
)
def func_array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions (Trino: ArrayTransformFunction.java:72,
    ArrayFilterFunction.java, ArrayReduceFunction.java, ArraySortFunction.java)
    = Spark transform/filter/aggregate/array_sort."""
    e = t(spark, sf, "embeddings").filter(F.col("vec_id") < 50)
    vd = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0), lambda a, x: a + x), 9).alias("sq_sum"),
        F.round(F.array_max(vd), 9).alias("max_v"),
        F.round(F.array_min(vd), 9).alias("min_v"),
        F.round(
            F.aggregate(F.filter(vd, lambda x: x > 0), F.lit(0.0), lambda a, x: a + x), 9
        ).alias("pos_sum"),
        # Serialized (not list-typed): the driver's pandas canonicalizer
        # cannot sort list cells, so array output columns must be strings.
        # `+ 0.0` normalizes IEEE -0.0 to +0.0 on both engines before %.3f.
        F.array_join(
            F.transform(
                F.array_sort(F.transform(F.slice(vd, 1, 4), lambda x: F.round(x, 3) + F.lit(0.0))),
                lambda x: F.format_string("%.3f", x),
            ),
            ",",
        ).alias("head_sorted"),
    ).orderBy("vec_id")


@REG.add(
    "func_vector_math",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 9) AS dot,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 9) AS cos_sim,
           round(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])), 9) AS norm_a
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 30
    ORDER BY a.vec_id
    """,
)
def func_vector_math(spark: SparkSession, sf: str) -> DataFrame:
    """dot_product / cosine_similarity parity (Trino:
    ArrayVectorFunctions.java, MathFunctions.java cosine_similarity) via the
    trino_spark.functions.vectors expression library."""
    e = t(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a")).filter(
        F.col("id_a") < 30
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            F.round(ts_vec.dot_product("emb_a", "emb_b"), 9).alias("dot"),
            F.round(ts_vec.cosine_similarity("emb_a", "emb_b"), 9).alias("cos_sim"),
            F.round(ts_vec.l2_norm("emb_a"), 9).alias("norm_a"),
        )
        .orderBy("id_a")
    )


@REG.add(
    "func_hash_ops",
    """
    SELECT doc_id,
           md5(text)                       AS h_md5,
           sha256(text)                    AS h_sha256,
           md5(concat(lang, ':', source))  AS h_key
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def func_hash_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Hash/binary functions (Trino: VarbinaryFunctions.java:41 — md5, sha256;
    xxhash64 exists both sides but with different seeds, so it's exercised in
    unit tests instead of the oracle)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.md5(F.concat("lang", F.lit(":"), "source")).alias("h_key"),
    ).orderBy("doc_id")


@REG.add(
    "func_url_ops",
    """
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'k=([a-z]+)', 1) AS param_k
    FROM (SELECT doc_id, concat('https://', source, '.example.com/docs/', lang, '?k=', lang) AS url
          FROM documents WHERE doc_id < 50) u
    ORDER BY doc_id
    """,
)
def func_url_ops(spark: SparkSession, sf: str) -> DataFrame:
    """URL extraction (Trino: UrlFunctions.java:41 url_extract_host/path/
    parameter) — Spark parse_url; DuckDB oracle uses the equivalent regexes."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/docs/"), "lang", F.lit("?k="), "lang"
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("param_k"),
    ).orderBy("doc_id")


@REG.add(
    "func_ip_ops",
    """
    WITH ips AS (
      SELECT o_orderkey,
             concat(CAST(10 + o_orderkey % 160 AS VARCHAR), '.',
                    CAST(o_orderkey % 256 AS VARCHAR), '.',
                    CAST((o_orderkey * 7) % 256 AS VARCHAR), '.',
                    CAST((o_orderkey * 13) % 256 AS VARCHAR)) AS ip
      FROM orders WHERE o_orderkey < 400
    ),
    v AS (
      SELECT o_orderkey, ip,
             (CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
              + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
              + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
              + CAST(split_part(ip, '.', 4) AS BIGINT)) AS n
      FROM ips
    )
    SELECT o_orderkey, ip,
           concat(split_part(ip, '.', 1), '.', split_part(ip, '.', 2), '.',
                  split_part(ip, '.', 3), '.0/24') AS prefix24,
           ((n >= 167772160 AND n < 184549376)
            OR (n >= 2886729728 AND n < 2887778304)
            OR (n >= 3232235520 AND n < 3232301056)
            OR (n >= 2130706432 AND n < 2147483648)
            OR (n >= 2851995648 AND n < 2852061184)) AS is_private
    FROM v
    ORDER BY o_orderkey
    """,
)
def func_ip_ops(spark: SparkSession, sf: str) -> DataFrame:
    """IPv4 function family (Trino: IpAddressFunctions.java:31 ip_prefix /
    is_private over the IPADDRESS type; ours over dotted-quad strings,
    SURVEY.md §1.2 maps IPADDRESS -> StringType + helpers). The DuckDB
    oracle recomputes with split_part + integer arithmetic."""
    from trino_spark.functions import ip as ts_ip

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 400)
    k = F.col("o_orderkey")
    ip = F.concat_ws(
        ".",
        (k % 160 + 10).cast("string"),
        (k % 256).cast("string"),
        ((k * 7) % 256).cast("string"),
        ((k * 13) % 256).cast("string"),
    )
    d = o.select("o_orderkey", ip.alias("ip"))
    return d.select(
        "o_orderkey",
        "ip",
        ts_ip.ip_prefix("ip", 24).alias("prefix24"),
        ts_ip.is_private_ip("ip").alias("is_private"),
    ).orderBy("o_orderkey")


@REG.add(
    "func_time_of_day",
    """
    WITH tv AS (
      SELECT o_orderkey,
             concat(lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0'), ':',
                    lpad(CAST((o_orderkey * 3) % 60 AS VARCHAR), 2, '0'), ':',
                    lpad(CAST((o_orderkey * 7) % 60 AS VARCHAR), 2, '0'), '.',
                    lpad(CAST((o_orderkey * 11) % 1000 AS VARCHAR), 3, '0')) AS tstr
      FROM orders WHERE o_orderkey < 300
    ),
    n AS (
      SELECT o_orderkey, tstr,
             ((o_orderkey % 24) * 3600000000000
              + ((o_orderkey * 3) % 60) * 60000000000
              + ((o_orderkey * 7) % 60) * 1000000000
              + ((o_orderkey * 11) % 1000) * 1000000) AS nanos
      FROM tv
    )
    SELECT o_orderkey, tstr, nanos,
           CAST(nanos // 3600000000000 AS BIGINT)        AS hh,
           CAST((nanos // 60000000000) % 60 AS BIGINT)   AS mi,
           CAST((nanos // 1000000) % 1000 AS BIGINT)     AS ms,
           concat(lpad(CAST(((nanos + 5400000000000) % 86400000000000) // 3600000000000 AS VARCHAR), 2, '0'), ':',
                  lpad(CAST((((nanos + 5400000000000) % 86400000000000) // 60000000000) % 60 AS VARCHAR), 2, '0'), ':',
                  lpad(CAST((((nanos + 5400000000000) % 86400000000000) // 1000000000) % 60 AS VARCHAR), 2, '0'), '.',
                  lpad(CAST((((nanos + 5400000000000) % 86400000000000) % 1000000000) // 1000000 AS VARCHAR), 3, '0')) AS plus_90m
    FROM n
    ORDER BY o_orderkey
    """,
)
def func_time_of_day(spark: SparkSession, sf: str) -> DataFrame:
    """TIME(p) emulation (Trino spi/type/TimeType.java — no Spark time-of-day
    type, SURVEY.md §1.2 policy: bigint nanos-of-day + helpers): parse,
    field extraction, wrap-around arithmetic, format. Oracle recomputes the
    same nanos arithmetic in DuckDB."""
    from trino_spark.functions import timeofday as tod

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 300)
    k = F.col("o_orderkey")
    tstr = F.concat(
        F.lpad((k % 24).cast("string"), 2, "0"), F.lit(":"),
        F.lpad(((k * 3) % 60).cast("string"), 2, "0"), F.lit(":"),
        F.lpad(((k * 7) % 60).cast("string"), 2, "0"), F.lit("."),
        F.lpad(((k * 11) % 1000).cast("string"), 3, "0"),
    )
    d = o.select("o_orderkey", tstr.alias("tstr"))
    nanos = tod.parse_time("tstr")
    return d.select(
        "o_orderkey",
        "tstr",
        nanos.alias("nanos"),
        tod.time_hour(nanos).alias("hh"),
        tod.time_minute(nanos).alias("mi"),
        tod.time_millisecond(nanos).alias("ms"),
        tod.format_time(tod.time_add(nanos, 90 * 60 * tod.NANOS_PER_SECOND), 3).alias(
            "plus_90m"
        ),
    ).orderBy("o_orderkey")


@REG.add(
    "func_stats_cdf",
    """
    WITH g AS (
      SELECT l_returnflag,
             CAST(sum(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END) AS DOUBLE) AS s,
             CAST(count(*) AS DOUBLE) AS n,
             avg(l_extendedprice) AS mu
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((s/n + 1.9208/n - 1.96 * sqrt((s/n)*(1-s/n)/n + 0.9604/(n*n)))
                 / (1 + 3.8416/n), 6) AS wilson_lo,
           round((s/n + 1.9208/n + 1.96 * sqrt((s/n)*(1-s/n)/n + 0.9604/(n*n)))
                 / (1 + 3.8416/n), 6) AS wilson_hi,
           round(0.5 + atan((mu - 30000.0) / 15000.0) / pi(), 6) AS cauchy,
           round(least(greatest((mu - 20000.0) / 40000.0, 0.0), 1.0), 6) AS unif
    FROM g
    ORDER BY l_returnflag
    """,
)
def func_stats_cdf(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical scalars (Trino: WilsonInterval.java, MathFunctions.java:79
    cauchy_cdf/uniform_cdf): exact closed forms as expressions; normal_cdf /
    inverse_normal_cdf are pytest-checked against libm (no DuckDB erf)."""
    from trino_spark.functions import stats as st

    g = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_quantity") < 25, 1).otherwise(0))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("l_extendedprice").alias("mu"),
        )
    )
    return g.select(
        "l_returnflag",
        F.round(st.wilson_interval_lower("s", "n", 1.96), 6).alias("wilson_lo"),
        F.round(st.wilson_interval_upper("s", "n", 1.96), 6).alias("wilson_hi"),
        F.round(st.cauchy_cdf(30000.0, 15000.0, "mu"), 6).alias("cauchy"),
        F.round(st.uniform_cdf(20000.0, 60000.0, "mu"), 6).alias("unif"),
    ).orderBy("l_returnflag")


@REG.add(
    "func_geo_distance",
    """
    WITH pts AS (
      SELECT c_custkey,
             -60.0 + (c_custkey % 120) AS lat,
             -170.0 + ((c_custkey * 7) % 340) AS lon
      FROM customer WHERE c_custkey < 500
    )
    SELECT c_custkey,
           round(2 * 6371.01 * asin(sqrt(
             pow(sin(radians(48.8566 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(48.8566))
               * pow(sin(radians(2.3522 - lon) / 2), 2))), 4) AS km_to_paris
    FROM pts
    ORDER BY c_custkey
    """,
)
def func_geo_distance(spark: SparkSession, sf: str) -> DataFrame:
    """great_circle_distance (Trino MathFunctions.java:79, haversine on the
    6371.01 km mean-Earth sphere); oracle recomputes the formula in DuckDB."""
    from trino_spark.functions import stats as st

    c = t(spark, sf, "customer").filter(F.col("c_custkey") < 500)
    k = F.col("c_custkey")
    pts = c.select(
        "c_custkey",
        (k % 120 - 60.0).cast("double").alias("lat"),
        ((k * 7) % 340 - 170.0).cast("double").alias("lon"),
    )
    return pts.select(
        "c_custkey",
        F.round(
            st.great_circle_distance("lat", "lon", F.lit(48.8566), F.lit(2.3522)), 4
        ).alias("km_to_paris"),
    ).orderBy("c_custkey")


@REG.add(
    "func_format_family",
    """
    WITH inp AS (
      SELECT n_nationkey AS nk,
             printf('%.1f%s', (n_nationkey * 37 % 500) + 0.2,
                    ['ns','us','ms','s','m','h','d'][(n_nationkey % 7) + 1]) AS dur,
             printf('%.2f%s', (n_nationkey * 13 % 90) + 0.2,
                    ['B','kB','MB','GB','TB'][(n_nationkey % 5) + 1]) AS sz,
             (n_nationkey + 1) * 7 * CAST(power(10, n_nationkey % 6) AS BIGINT) AS num,
             (n_nationkey * 321729) % 1500000 AS secs
      FROM nation
    ),
    units AS (
      SELECT *,
             CASE WHEN dur LIKE '%ns' THEN 0.000001 WHEN dur LIKE '%us' THEN 0.001
                  WHEN dur LIKE '%ms' THEN 1.0 WHEN dur LIKE '%s' THEN 1000.0
                  WHEN dur LIKE '%m' THEN 60000.0 WHEN dur LIKE '%h' THEN 3600000.0
                  ELSE 86400000.0 END AS dmult,
             CASE WHEN sz LIKE '%kB' THEN 1024.0 WHEN sz LIKE '%MB' THEN 1048576.0
                  WHEN sz LIKE '%GB' THEN 1073741824.0 WHEN sz LIKE '%TB' THEN 1099511627776.0
                  ELSE 1.0 END AS smult,
             CASE WHEN abs(num) < 1000 THEN 0 WHEN abs(num) < 1000000 THEN 1
                  WHEN abs(num) < 1000000000 THEN 2 WHEN abs(num) < 1000000000000 THEN 3
                  WHEN abs(num) < 1000000000000000 THEN 4 ELSE 5 END AS p
      FROM inp
    ),
    fmt AS (
      SELECT *,
             num / power(1000, p) AS frac,
             CASE WHEN num / power(1000, p) < 10 THEN 2
                  WHEN num / power(1000, p) < 100 THEN 1 ELSE 0 END AS dec,
             secs // 604800 AS w, (secs % 604800) // 86400 AS d,
             (secs % 86400) // 3600 AS h, (secs % 3600) // 60 AS mi, secs % 60 AS s
      FROM units
    )
    SELECT nk,
           CAST(round(CAST(regexp_extract(dur, '^([0-9.]+)', 1) AS DOUBLE) * dmult)
                AS BIGINT) AS dur_ms,
           CAST(floor(CAST(regexp_extract(sz, '^([0-9.]+)', 1) AS DOUBLE) * smult)
                AS BIGINT) AS size_bytes,
           regexp_replace(
             printf('%.2f', sign(frac) * floor(abs(frac) * power(10, dec) + 0.5)
                            / power(10, dec)),
             '\\.?0+$', '')
             || ['','K','M','B','T','Q'][p + 1] AS num_fmt,
           CASE WHEN concat_ws(', ',
                  CASE WHEN w > 0 THEN w || ' week' || (CASE WHEN w = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN d > 0 THEN d || ' day' || (CASE WHEN d = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN h > 0 THEN h || ' hour' || (CASE WHEN h = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN mi > 0 THEN mi || ' minute' || (CASE WHEN mi = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN s > 0 THEN s || ' second' || (CASE WHEN s = 1 THEN '' ELSE 's' END) END) = ''
                THEN '0 seconds'
                ELSE concat_ws(', ',
                  CASE WHEN w > 0 THEN w || ' week' || (CASE WHEN w = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN d > 0 THEN d || ' day' || (CASE WHEN d = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN h > 0 THEN h || ' hour' || (CASE WHEN h = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN mi > 0 THEN mi || ' minute' || (CASE WHEN mi = 1 THEN '' ELSE 's' END) END,
                  CASE WHEN s > 0 THEN s || ' second' || (CASE WHEN s = 1 THEN '' ELSE 's' END) END)
           END AS human_secs
    FROM fmt
    ORDER BY nk
    """,
)
def func_format_family(spark: SparkSession, sf: str) -> DataFrame:
    """parse_duration / parse_data_size / format_number /
    human_readable_seconds (DateTimeFunctions.java:732,
    DataSizeFunctions.java:41, FormatNumberFunction.java:60,
    timestamp/HumanReadableSeconds.java:35); the oracle recomputes each
    reference formula in DuckDB over the same synthesized inputs."""
    from trino_spark.functions import formatting as fm

    nk = F.col("n_nationkey")
    inp = t(spark, sf, "nation").select(
        nk.alias("nk"),
        F.format_string(
            "%.1f%s",
            (nk * 37 % 500).cast("double") + 0.2,
            F.element_at(F.lit(["ns", "us", "ms", "s", "m", "h", "d"]), (nk % 7) + 1),
        ).alias("dur"),
        F.format_string(
            "%.2f%s",
            (nk * 13 % 90).cast("double") + 0.2,
            F.element_at(F.lit(["B", "kB", "MB", "GB", "TB"]), (nk % 5) + 1),
        ).alias("sz"),
        ((nk + 1) * 7 * F.pow(F.lit(10.0), (nk % 6).cast("double")).cast("long")).alias("num"),
        ((nk * 321729) % 1500000).alias("secs"),
    )
    return inp.select(
        "nk",
        fm.parse_duration("dur").alias("dur_ms"),
        fm.parse_data_size("sz").cast("long").alias("size_bytes"),
        fm.format_number("num").alias("num_fmt"),
        fm.human_readable_seconds("secs").alias("human_secs"),
    ).orderBy("nk")
