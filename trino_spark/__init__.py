"""trino_spark — a PySpark-native analytics engine with Trino's capabilities.

A from-scratch engine that reproduces WHAT trinodb/trino computes — its SQL
surface, type semantics, function library, operator inventory (see SURVEY.md
§2) — expressed idiomatically on Spark: DataFrame/SQL plans optimized by
Catalyst, Tungsten execution, Structured Streaming for the streaming
extension, and Arrow-batched Pandas UDFs only where built-ins can't express
the semantics.

Layout:
    session.py    tuned SparkSession factory (AQE, CBO, Arrow, UTC)
    catalog.py    catalog/federation registry: name -> DataFrame source
    functions/    Trino-name scalar/aggregate function parity layer
    operators/    relational + LLM-data-pipeline operators (dedup,
                  similarity search, text analysis, multimodal)
    queries/      the query corpus (adapted TPC-H + operator coverage),
                  each with a DuckDB oracle SQL string
    streaming/    Structured Streaming extension over the events table
    plans/        plan inspection helpers (pushdown / broadcast asserts)
"""

from trino_spark.session import get_spark
from trino_spark.catalog import Catalog, register_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "Catalog", "register_tables", "__version__"]
