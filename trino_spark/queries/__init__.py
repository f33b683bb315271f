"""The engine's query corpus: every entry is an implemented operator/query
from SURVEY.md §2 with (where SQL-expressible) a DuckDB oracle.

Registries are merged here; `__spark_entry__.py` (driver contract) is a thin
adapter over `all_specs()`.
"""

from __future__ import annotations

from trino_spark.queries.base import QueryRegistry, QuerySpec


def all_specs() -> dict[str, QuerySpec]:
    """All registered query specs, in driver-verification priority order.

    The driver's oracle run processes entries in registry order under a
    budget (r1 stopped at the first 50), so modules whose queries have not
    yet earned a green CORRECTNESS row come FIRST; the long-green TPC-H /
    relational blocks come last. Revisit this ordering each round as rows
    turn green.
    """
    reg = QueryRegistry()
    for mod_name in (
        # -- never driver-verified as of r1: front of the line --
        "federation_q",
        "timeseries",
        "merge_q",
        "llmops",
        "aggregates",
        "dialect_q",
        "patterns_q",
        "misc_q",
        "geo_q",
        "streaming_q",
        # -- partially verified (first 3 had rows in r1) --
        "functions_q",
        # -- fully green in r1: last --
        "relational",
        "tpch",
    ):
        try:
            import importlib

            mod = importlib.import_module(f"trino_spark.queries.{mod_name}")
            reg.merge(mod.REG)
        except ModuleNotFoundError:
            pass
    return reg.specs()
