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

    # Round-3 head: every query with NO green CORRECTNESS row in r1 ∪ r2
    # (including all round-3-new queries, which cannot have one), sorted
    # cheapest-first by measured runtime (min of the strict-mimic and
    # steady-state bench timings) so ANY driver budget converts the
    # maximum number of never-verified entries into green rows.
    # Already-green entries re-verify last via the module rotation below.
    head = [
        "jdbc_agg_pushdown",
        # r2's green was vacuous (0 rows); de-vacuated this round and must
        # earn a non-trivial row, so it rides at the front despite being
        # technically "green"
        "text_ngram_jaccard_pairs",
        "tpcds_q96",
        "tpcds_q55",
        "tpcds_q42",
        "tpcds_q52",
        "tpcds_q03",
        "agg_top_frequent",
        "tpcds_q19",
        "geo_sphere_distance",
        "func_try_cast",
        "tpcds_q07",
        "tpcds_q13",
        # late additions, slotted by their ~0.3 s measured cost
        "tpcds_q12",
        "tpcds_q20",
        "tpcds_q09",
        "func_url_ops",
        "func_hash_ops",
        "tpcds_q36",
        "interval_arithmetic",
        "variant_get_path",
        "func_array_hof",
        "text_fingerprint",
        "text_stats",
        "tpcds_q01",
        "agg_numeric_histogram",
        "func_datetime_ops",
        "func_geo_distance",
        "func_luhn_check",
        "corpus_rebalance_langs",
        "tpcds_q15",
        "tpcds_q06",
        "tpcds_q97",
        "tpcds_q26",
        "agg_reduce_product",
        "ts_ohlc",
        "tpcds_q61",
        "tpcds_q98",
        "tpcds_q46",
        "ts_gap_fill",
        "skew_salted_join",
        "agg_histogram_map",
        "agg_map_union",
        "func_time_of_day",
        "func_math_ops",
        "func_stats_cdf",
        "tpcds_q32",
        "tpcds_q08",
        "agg_listagg",
        "func_ip_ops",
        "json_table_flatten",
        "func_vector_math",
        "tpcds_q89",
        "window_groups_frame",
        "tpcds_q88",
        "tpcds_q34",
        "tpcds_q51",
        "func_json_ops",
        "corpus_pack_sequences",
        "ai_sentiment_stub",
        "multimodal_ppm_decode",
        "variant_shred",
        "multimodal_audio_stub",
        "multimodal_decode_stub",
        "tpcds_q71",
        "recursive_cte_walk",
        "text_lang_id",
        "ctas_insert_roundtrip",
        "similarity_bruteforce_topk",
        "func_format_family",
        "text_pii_mask",
        "sketch_most_frequent",
        "sketch_setdigest_jaccard",
        "agg_entropy",
        "partition_overwrite_roundtrip",
        "text_decontaminate",
        "text_word_stem_topk",
        "dialect_sql_json",
        "dialect_ptf_sequence",
        "geo_polygon_holes",
        "tpcds_q02",
        "similarity_pq_topk",
        "similarity_ivf_topk",
        "dialect_sql_routine",
        "sketch_quantile_union",
        "dialect_ptf_udtf",
        "agg_approx_family",
        "dialect_routine_control",
        "dialect_at_time_zone",
        "similarity_lsh_topk",
        "similarity_embedding_neardup",
        "dialect_array_combinatorics",
        "zorder_write_roundtrip",
        "geo_bing_tiles",
        "dml_partitioned_lifecycle",
        "bucketed_join_roundtrip",
        "sketch_tdigest_quantiles",
        "dialect_match_recognize",
        "dedup_connected_components",
        "dedup_simhash_pairs",
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
