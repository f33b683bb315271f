"""The engine's query corpus: every entry is an implemented operator/query
from SURVEY.md §2 with (where SQL-expressible) a DuckDB oracle.

Registries are merged here; `__spark_entry__.py` (driver contract) is a thin
adapter over `all_specs()`.
"""

from __future__ import annotations

from trino_spark.queries.base import QueryRegistry, QuerySpec


def all_specs() -> dict[str, QuerySpec]:
    from trino_spark.queries import tpch

    reg = QueryRegistry()
    reg.merge(tpch.REG)
    for mod_name in (
        "relational",
        "functions_q",
        "llmops",
        "aggregates",
        "timeseries",
        "merge_q",
        "dialect_q",
        "patterns_q",
        "misc_q",
        "geo_q",
        "streaming_q",
    ):
        try:
            import importlib

            mod = importlib.import_module(f"trino_spark.queries.{mod_name}")
            reg.merge(mod.REG)
        except ModuleNotFoundError:
            pass
    return reg.specs()
