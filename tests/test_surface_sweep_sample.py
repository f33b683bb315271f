"""Regression guard for the verbatim-SQL function surface: a fast sample
of scripts/function_sweep.py's probe corpus (the full 445-name sweep
regenerates FUNCTIONS.md; this keeps the load-bearing names green in the
normal pytest loop)."""

from __future__ import annotations

import pytest

from scripts.function_sweep import ABSENT, SCALAR_CASES, TABLE_CASES
from trino_spark.dialect.engine import TrinoEngine

SAMPLE_SCALARS = [
    "murmur3", "to_base64url", "char2hexint", "parse_data_size",
    "inverse_beta_cdf", "timezone", "to_milliseconds", "color", "render",
    "ST_Point", "ST_Contains", "ST_Intersection", "bing_tile_quadkey",
    "great_circle_distance", "to_encoded_polyline", "features",
    "current_groups", "empty_approx_set", "if", "try_cast",
]
SAMPLE_TABLES = [
    "qdigest_agg", "tdigest_agg", "make_set_digest", "approx_most_frequent",
    "numeric_histogram", "learn_classifier", "map_union", "reduce_agg",
    "convex_hull_agg", "geometry_union_agg", "approx_set", "merge",
    "exclude_columns",
]


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return TrinoEngine(spark, sf_dir)


@pytest.mark.parametrize("name", SAMPLE_SCALARS)
def test_scalar_surface(eng, name):
    assert name not in ABSENT
    eng.sql("SELECT " + SCALAR_CASES[name] + " AS v").collect()


@pytest.mark.parametrize("name", SAMPLE_TABLES)
def test_table_surface(eng, name):
    assert name not in ABSENT
    eng.sql(TABLE_CASES[name]).collect()
