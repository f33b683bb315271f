"""MATCH_RECOGNIZE differential fuzz regression (scripts/mr_fuzz.py): the
NFA vs an independent Python-`re` reference matcher on random patterns
(concat + greedy quantifiers + alternation groups) over random symbol
streams — leftmost non-overlapping greedy spans must agree exactly."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def test_reference_matcher_semantics():
    from mr_fuzz import reference_matches

    # greedy V+ P over 'vvpv': one match [0,3)
    assert reference_matches("vvpv".replace("v", "a").replace("p", "b"), "A+ B") == [(0, 3)]
    # non-overlap: 'abab' with (A B) -> two matches
    assert reference_matches("abab", "A B") == [(0, 2), (2, 4)]
    # alternation
    assert reference_matches("acb", "(A | B) C") == [(0, 2)]


def test_mr_differential(spark, sf_dir):
    from mr_fuzz import fuzz_mr

    assert fuzz_mr(n_patterns=10, seed=42) == []


def test_pattern_window_differential(spark, sf_dir):
    from mr_fuzz import fuzz_pattern_window

    assert fuzz_pattern_window(n_patterns=8, seed=42) == []
