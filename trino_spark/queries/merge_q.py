"""MERGE / DML corpus: post-merge relation computed as a query so the
DuckDB oracle can state the same semantics independently (DuckDB side uses
anti/semi joins + UNION; Spark side is the single full-outer-join rewrite
in operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_spark.operators.merge import merge_into
from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()

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
