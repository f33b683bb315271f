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

    # Round-3 head: exactly the queries with NO green CORRECTNESS row in
    # r1 ∪ r2 (computed from CORRECTNESS_r01/r02.json vs this registry),
    # sorted cheapest-first by their BENCH_FULL timing so the driver's
    # 50-query budget maximizes new green rows per second. New round-3
    # queries (tpcds_*, time travel, DML, multimodal decode, row filters)
    # are appended right after so they get verified this round too.
    # Already-green entries come last via the module rotation below.
    head = [
        "agg_top_frequent",
        "func_hash_ops",
        "func_url_ops",
        "variant_get_path",
        "func_geo_distance",
        "geo_sphere_distance",
        "func_try_cast",
        "func_luhn_check",
        "text_stats",
        "func_datetime_ops",
        "interval_arithmetic",
        "corpus_rebalance_langs",
        "ts_ohlc",
        "agg_histogram_map",
        "text_fingerprint",
        "agg_map_union",
        "func_array_hof",
        "ts_gap_fill",
        "agg_reduce_product",
        "window_groups_frame",
        "func_math_ops",
        "agg_numeric_histogram",
        "agg_listagg",
        "corpus_pack_sequences",
        "func_time_of_day",
        "func_ip_ops",
        "func_stats_cdf",
        "func_vector_math",
        "variant_shred",
        "func_json_ops",
        "recursive_cte_walk",
        "multimodal_decode_stub",
        "json_table_flatten",
        "skew_salted_join",
        "similarity_bruteforce_topk",
        "ai_sentiment_stub",
        "func_format_family",
        "text_pii_mask",
        "text_lang_id",
        "ctas_insert_roundtrip",
        "agg_entropy",
        "multimodal_audio_stub",
        "sketch_most_frequent",
        "partition_overwrite_roundtrip",
        "sketch_setdigest_jaccard",
        "text_decontaminate",
        "text_word_stem_topk",
        "geo_polygon_holes",
        "dialect_array_combinatorics",
        "dialect_at_time_zone",
        "dialect_sql_routine",
        "dialect_sql_json",
        "dialect_ptf_sequence",
        "similarity_pq_topk",
        "similarity_ivf_topk",
        "similarity_lsh_topk",
        "sketch_quantile_union",
        "similarity_embedding_neardup",
        "dialect_ptf_udtf",
        "geo_bing_tiles",
        "dialect_routine_control",
        "agg_approx_family",
        "bucketed_join_roundtrip",
        "dialect_match_recognize",
        "zorder_write_roundtrip",
        "dedup_simhash_pairs",
        "sketch_tdigest_quantiles",
        "dedup_connected_components",
        # --- round-3-new queries (no prior CORRECTNESS row possible) ---
        "text_ngram_jaccard_pairs",  # de-vacuated this round; re-verify
        "dml_partitioned_lifecycle",  # partition-scoped DML + time travel
        "tpcds_q03",
        "tpcds_q42",
        "tpcds_q52",
        "tpcds_q55",
        "tpcds_q98",
        "tpcds_q06",
        "tpcds_q36",
        "tpcds_q51",
        "tpcds_q08",
        "tpcds_q01",
        "tpcds_q07",
        "tpcds_q13",
        "tpcds_q19",
        "tpcds_q96",
        "tpcds_q97",
        "tpcds_q15",
        "tpcds_q26",
        "tpcds_q32",
        "tpcds_q34",
        "tpcds_q46",
        "tpcds_q61",
        "tpcds_q71",
        "tpcds_q88",
        "tpcds_q02",
        "tpcds_q89",
        "multimodal_ppm_decode",  # real netpbm decode vs closed-form oracle
        "jdbc_agg_pushdown",  # whole-aggregation pushdown into JDBC
    ]
    # Modules whose queries were never driver-verified (r1 stopped at 50
    # with TPC-H/relational first). Round-robin interleave so ANY budget
    # prefix covers the maximum number of operator families.
    fresh_mods = (
        "tpcds",
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
