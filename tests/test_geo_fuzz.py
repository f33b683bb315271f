"""Geometry-kernel differential fuzz regression (scripts/geo_fuzz.py):
Greiner–Hormann boolean ops vs an independent Sutherland–Hodgman convex
clip; union/difference areas checked by inclusion–exclusion."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def test_sh_reference_squares():
    from geo_fuzz import ring_area, sh_clip

    a = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    b = [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]
    assert abs(ring_area(sh_clip(a, b)) - 1.0) < 1e-12
    far = [(10, 10), (11, 10), (11, 11), (10, 11), (10, 10)]
    assert ring_area(sh_clip(a, far)) == 0.0


def test_geo_boolean_differential():
    from geo_fuzz import fuzz_geo

    assert fuzz_geo(n_pairs=60, seed=42) == []


def test_geo_concave_identities():
    from geo_fuzz import fuzz_geo_concave

    assert fuzz_geo_concave(n_pairs=40, seed=43) == []


def test_convex_generator_not_vacuous():
    import random

    from geo_fuzz import convex_polygon

    rng = random.Random(0)
    rings = [convex_polygon(rng, 0, 0, 2.0) for _ in range(10)]
    assert all(r is not None and len(r) >= 4 and r[0] == r[-1] for r in rings)


def test_de9im_predicate_consistency():
    from geo_fuzz import fuzz_de9im

    assert fuzz_de9im(n=300, seed=44) == []
