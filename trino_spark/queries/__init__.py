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
    import importlib

    # r1 oracle failures (now fixed) and r1 crashes (now fixed) MUST earn a
    # green row, so they go first regardless of module; then the round-2-new
    # operators (cheap ones — the expensive LM/pair-stats queries stay in
    # their module rotation so a time-budgeted run still maximizes family
    # coverage per second).
    head = [
        "agg_stats",
        "func_math_ops",
        "agg_ordered_collect",
        "ts_asof_join",
        "ts_range_join",
        "ts_session_window",
        "merge_upsert_delete",
        "dialect_dml_lifecycle",
        "dialect_scalar_residue",
        "dialect_mr_aggregates",
        "agg_minmax_by_n",
        "tpchgen_structure",
        "text_repetition_signals",
        "dialect_quantified_row",
        "dialect_json_table",
        "json_table_nested",
        "tokenizer_bpe_pairs",
        "streaming_interval_join",
        "corpus_quality_filter",
        "embedding_label_centroids",
        "text_lm_perplexity",
    ]
    # Modules whose queries were never driver-verified (r1 stopped at 50
    # with TPC-H/relational first). Round-robin interleave so ANY budget
    # prefix covers the maximum number of operator families.
    fresh_mods = (
        "federation_q",
        "llmops",
        "dialect_q",
        "patterns_q",
        "misc_q",
        "geo_q",
        "streaming_q",
        "timeseries",
        "aggregates",
        "functions_q",
        "merge_q",
    )
    # Fully green in r1: re-verified last under whatever budget remains.
    green_mods = ("relational", "tpch")

    mod_specs = {}
    for mod_name in fresh_mods + green_mods:
        try:
            mod = importlib.import_module(f"trino_spark.queries.{mod_name}")
            mod_specs[mod_name] = mod.REG.specs()
        except ModuleNotFoundError:
            pass

    ordered: dict[str, QuerySpec] = {}

    def _take(name: str, spec: QuerySpec) -> None:
        if name not in ordered:
            ordered[name] = spec

    flat = {n: s for specs in mod_specs.values() for n, s in specs.items()}
    for n in head:
        if n in flat:
            _take(n, flat[n])
    queues = [list(mod_specs.get(m, {}).items()) for m in fresh_mods]
    while any(queues):
        for q in queues:
            if q:
                _take(*q.pop(0))
    for m in green_mods:
        for n, s in mod_specs.get(m, {}).items():
            _take(n, s)
    return ordered
