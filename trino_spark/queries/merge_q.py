"""MERGE / DML corpus: post-merge relation computed as a query so the
DuckDB oracle can state the same semantics independently (DuckDB side uses
anti/semi joins + UNION; Spark side is the single full-outer-join rewrite
in operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_spark.operators.merge import merge_into
from trino_spark.queries.base import QueryRegistry, materialized, t

REG = QueryRegistry()


def _engine(spark, sf):
    """Shared per-(session, sf_dir) engine (queries/base.py): the
    lifecycle queries are self-contained (per-process table names, DROP
    at the end), so sharing carries no cross-query state."""
    from trino_spark.queries.base import engine_for

    return engine_for(spark, sf)

# Deterministic change set derived from orders itself:
#   key % 13 == 0 -> DELETE
#   key %  7 == 0 -> UPDATE (price +10%, priority tagged)
#   key %  5 == 0 -> also present shifted by +10_000_000 -> INSERT (new keys)
_SRC_SQL = """
  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
  WHERE o_orderkey % 13 = 0 OR o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS k, o_totalprice AS p FROM orders
  WHERE o_orderkey % 5 = 0
"""


def _source(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    k, p = F.col("o_orderkey"), F.col("o_totalprice")
    changes = o.filter((k % 13 == 0) | (k % 7 == 0)).select(k.alias("o_orderkey"), p.alias("p"))
    inserts = o.filter(k % 5 == 0).select((k + 10_000_000).alias("o_orderkey"), p.alias("p"))
    return changes.unionByName(inserts)


@REG.add(
    "merge_upsert_delete",
    f"""
    WITH src AS ({_SRC_SQL}),
    tgt AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders)
    SELECT t.o_orderkey, t.o_custkey,
           round(CASE WHEN s.k IS NOT NULL THEN t.o_totalprice * 1.1
                      ELSE t.o_totalprice END, 6) AS o_totalprice,
           CASE WHEN s.k IS NOT NULL THEN 'MERGED' ELSE t.o_orderpriority END AS o_orderpriority
    FROM tgt t LEFT JOIN src s ON s.k = t.o_orderkey
    WHERE NOT (s.k IS NOT NULL AND t.o_orderkey % 13 = 0)
    UNION ALL
    SELECT s.k AS o_orderkey, CAST(-1 AS BIGINT) AS o_custkey,
           round(s.p, 6) AS o_totalprice, 'INSERTED' AS o_orderpriority
    FROM src s LEFT JOIN tgt t ON t.o_orderkey = s.k
    WHERE t.o_orderkey IS NULL
    ORDER BY o_orderkey
    """,
)
def merge_upsert_delete_q(spark: SparkSession, sf: str) -> DataFrame:
    """Full MERGE: WHEN MATCHED AND key%13=0 DELETE / WHEN MATCHED UPDATE
    (price+10%, tag) / WHEN NOT MATCHED INSERT — computed as the post-merge
    relation by the full-outer-join rewrite."""
    target = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    merged = merge_into(
        target,
        _source(spark, sf),
        keys=["o_orderkey"],
        update_set={
            "o_totalprice": F.col("o_totalprice") * 1.1,
            "o_orderpriority": F.lit("MERGED"),
        },
        delete_condition=F.col("o_orderkey") % 13 == 0,
        insert_values={
            "o_orderkey": F.col("s_o_orderkey"),
            "o_custkey": F.lit(-1).cast("long"),
            "o_totalprice": F.col("s_p"),
            "o_orderpriority": F.lit("INSERTED"),
        },
    )
    return merged.withColumn("o_totalprice", F.round("o_totalprice", 6)).orderBy("o_orderkey")


@REG.add(
    "dialect_dml_lifecycle",
    """
    WITH base AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r FROM nation),
    ins AS (SELECT n_nationkey + 100 AS k, upper(n_name) AS name, n_regionkey AS r
            FROM nation WHERE n_regionkey = 0),
    t1 AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
    t2 AS (SELECT k, CASE WHEN r = 1 THEN lower(name) ELSE name END AS name, r FROM t1),
    t3 AS (SELECT * FROM t2 WHERE r <> 3),
    src AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r
            FROM nation WHERE n_regionkey IN (2, 4)
            UNION ALL
            SELECT n_nationkey + 300 AS k, n_name AS name, 9 AS r
            FROM nation WHERE n_regionkey = 2),
    surv AS (
      SELECT t.k, CASE WHEN s.k IS NOT NULL AND s.r <> 4 THEN t.name || '!' ELSE t.name END AS name, t.r
      FROM t3 t LEFT JOIN src s ON t.k = s.k
      WHERE NOT coalesce(s.r = 4, FALSE)
    ),
    inserted AS (
      SELECT s.k + 200 AS k, s.name AS name, s.r AS r
      FROM src s LEFT JOIN t3 t ON t.k = s.k WHERE t.k IS NULL
    )
    SELECT CAST(k AS BIGINT) AS k, name, CAST(r AS INTEGER) AS r
    FROM (SELECT * FROM surv UNION ALL SELECT * FROM inserted)
    ORDER BY k
    """,
)
def dialect_dml_lifecycle_q(spark: SparkSession, sf: str) -> DataFrame:
    """Full DML lifecycle through TrinoEngine.sql (SURVEY §3.3 entry point
    C): CTAS -> INSERT -> UPDATE -> DELETE -> MERGE on a copy-on-write
    managed table (dialect/dml.py), final state returned as the result.
    The oracle states the same end state as a pure SELECT CTE chain."""
    import os

    eng = _engine(spark, sf)
    # Per-process table name: concurrent runners (bench + driver) must not
    # race on one copy-on-write directory.
    tbl = f"dml_life_{os.getpid()}"
    eng.sql(f"DROP TABLE IF EXISTS {tbl}")
    eng.sql(
        f"CREATE TABLE {tbl} AS SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r FROM nation"
    )
    eng.sql(
        f"INSERT INTO {tbl} SELECT n_nationkey + 100, upper(n_name), n_regionkey FROM nation WHERE n_regionkey = 0"
    )
    eng.sql(f"UPDATE {tbl} SET name = lower(name) WHERE r = 1")
    eng.sql(f"DELETE FROM {tbl} WHERE r = 3")
    eng.sql(
        f"""
        MERGE INTO {tbl} t
        USING (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r
               FROM nation WHERE n_regionkey IN (2, 4)
               UNION ALL
               SELECT n_nationkey + 300 AS k, n_name AS name, 9 AS r
               FROM nation WHERE n_regionkey = 2) s
        ON t.k = s.k
        WHEN MATCHED AND s.r = 4 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = concat(t.name, '!')
        WHEN NOT MATCHED THEN INSERT (k, name, r) VALUES (s.k + 200, s.name, s.r)
        """
    )
    out = eng.sql(f"SELECT CAST(k AS BIGINT) AS k, name, CAST(r AS INT) AS r FROM {tbl} ORDER BY k")
    # Materialize before dropping the backing table (builders are lazy).
    res = materialized(spark, out)
    eng.sql(f"DROP TABLE {tbl}")
    return res


def _dml_partitioned_lifecycle_impl(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-scoped DML + snapshot time travel through TrinoEngine.sql:
    partitioned CTAS -> partition DELETE -> partition-local UPDATE ->
    append INSERT, then a FULL JOIN of the CURRENT state against
    ``FOR VERSION AS OF 1`` (the pre-mutation snapshot). Untouched
    partitions are carried between versions by hardlink — the
    Delta/Iceberg file-scoped copy-on-write shape (dialect/dml.py);
    time travel per SqlBase.g4 queryPeriod / trino-iceberg semantics."""
    import os

    eng = _engine(spark, sf)
    tbl = f"dml_part_{os.getpid()}"
    eng.sql(f"DROP TABLE IF EXISTS {tbl}")
    eng.sql(
        f"CREATE TABLE {tbl} WITH (partitioned_by = ARRAY['r']) AS "
        "SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r FROM nation"
    )
    eng.sql(f"DELETE FROM {tbl} WHERE r = 3")
    eng.sql(f"UPDATE {tbl} SET name = lower(name) WHERE r = 1")
    eng.sql(
        f"INSERT INTO {tbl} SELECT n_nationkey + 100, upper(n_name), n_regionkey "
        "FROM nation WHERE n_regionkey = 0"
    )
    out = eng.sql(
        f"""
        WITH v1 AS (SELECT r, count(*) AS n FROM {tbl} FOR VERSION AS OF 1 GROUP BY r),
             cur AS (SELECT r, count(*) AS n, min(name) AS mn FROM {tbl} GROUP BY r)
        SELECT CAST(coalesce(v1.r, cur.r) AS INT) AS r,
               CAST(coalesce(v1.n, 0) AS BIGINT)  AS n_v1,
               CAST(coalesce(cur.n, 0) AS BIGINT) AS n_cur,
               cur.mn AS min_name_cur
        FROM v1 FULL JOIN cur ON v1.r = cur.r
        ORDER BY r
        """
    )
    res = materialized(spark, out)
    eng.sql(f"DROP TABLE {tbl}")
    return res


REG.add(
    "dml_partitioned_lifecycle",
    """
    WITH base AS (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r FROM nation),
    v1 AS (SELECT r, count(*) AS n FROM base GROUP BY r),
    cur_rows AS (
      SELECT k, CASE WHEN r = 1 THEN lower(name) ELSE name END AS name, r
      FROM base WHERE r <> 3
      UNION ALL
      SELECT k + 100, upper(name), r FROM base WHERE r = 0
    ),
    cur AS (SELECT r, count(*) AS n, min(name) AS mn FROM cur_rows GROUP BY r)
    SELECT CAST(coalesce(v1.r, cur.r) AS INTEGER) AS r,
           CAST(coalesce(v1.n, 0) AS BIGINT)      AS n_v1,
           CAST(coalesce(cur.n, 0) AS BIGINT)     AS n_cur,
           cur.mn AS min_name_cur
    FROM v1 FULL JOIN cur ON v1.r = cur.r
    ORDER BY r
    """,
)(_dml_partitioned_lifecycle_impl)


def _meta_files_partitions_impl(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg-style ``$files`` / ``$partitions`` metadata tables over a
    partitioned managed table (reference: plugin/trino-iceberg
    FilesTable.java / PartitionsTable.java). Counts come from parquet
    FOOTERS (dialect/dml.py:_file_rows) — the oracle reconciles them
    against true per-partition group counts of the source data, proving
    footer metadata == data without a data scan."""
    import os

    eng = _engine(spark, sf)
    tbl = f"meta_ft_{os.getpid()}"
    eng.sql(f"DROP TABLE IF EXISTS {tbl}")
    eng.sql(
        f"CREATE TABLE {tbl} WITH (partitioned_by = ARRAY['r']) AS "
        "SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r FROM nation"
    )
    out = eng.sql(
        f"""
        SELECT p.partition AS part,
               CAST(p.record_count AS BIGINT) AS record_count,
               p.file_count >= 1 AS has_files,
               p.total_size > 0 AS has_bytes,
               CAST(t.total_rows AS BIGINT) AS table_rows
        FROM "{tbl}$partitions" p
        CROSS JOIN (SELECT sum(record_count) AS total_rows FROM "{tbl}$files") t
        ORDER BY part
        """
    )
    res = materialized(spark, out)
    eng.sql(f"DROP TABLE {tbl}")
    return res


REG.add(
    "meta_files_partitions",
    """
    SELECT concat('r=', CAST(r AS VARCHAR)) AS part,
           CAST(count(*) AS BIGINT)         AS record_count,
           true                             AS has_files,
           true                             AS has_bytes,
           CAST(25 AS BIGINT)               AS table_rows
    FROM nation
    GROUP BY r
    ORDER BY part
    """.replace("FROM nation", "FROM (SELECT n_regionkey AS r FROM nation) s"),
)(_meta_files_partitions_impl)
