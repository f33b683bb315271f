"""Differential expression-composition fuzz regression (scripts/expr_fuzz.py):
random typed scalar expressions through the dialect engine vs DuckDB on
identical SQL text. The standalone script runs wider sweeps; this pins a
fixed-seed sample so translator regressions (nesting, NULL propagation,
CASE typing, precedence) fail the suite."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def test_expression_composition_differential(spark, sf_dir):
    from expr_fuzz import fuzz

    bad = fuzz(n_exprs=80, seed=42, sf_dir=sf_dir)
    assert bad == []


def test_generator_produces_all_types():
    import random

    from expr_fuzz import gen

    rng = random.Random(0)
    assert isinstance(gen(rng, "int", 3), str)
    assert isinstance(gen(rng, "str", 3), str)
    assert isinstance(gen(rng, "bool", 3), str)


def test_aggregate_differential(spark, sf_dir):
    from expr_fuzz import fuzz_agg

    assert fuzz_agg(n_exprs=30, seed=42, sf_dir=sf_dir) == []


def test_window_differential(spark, sf_dir):
    from expr_fuzz import fuzz_agg

    assert fuzz_agg(n_exprs=30, seed=43, sf_dir=sf_dir, window=True) == []


def test_datetime_pattern_differential(spark, sf_dir):
    from expr_fuzz import fuzz_datetime

    assert fuzz_datetime(n_formats=20, seed=42, sf_dir=sf_dir) == []


def test_json_path_differential(spark, sf_dir):
    from expr_fuzz import fuzz_json

    assert fuzz_json(n_docs=15, seed=42, sf_dir=sf_dir) == []


def test_array_function_differential(spark, sf_dir):
    from expr_fuzz import fuzz_arrays

    assert fuzz_arrays(n_exprs=25, seed=42, sf_dir=sf_dir) == []
