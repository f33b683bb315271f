"""Property-based tests (hypothesis) for the pure-Python kernels.

The reference has no property-based layer (SURVEY.md §5); these cover the
three components with the richest input spaces: the SQL tokenizer (must be
lossless for every input), the MATCH_RECOGNIZE NFA (must agree with
Python's leftmost-greedy regex engine on the shared pattern subset), and
the datetime pattern translator.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from trino_spark.dialect.tokenizer import render, tokenize
from trino_spark.functions.datetimes import mysql_to_java
from trino_spark.operators.match_recognize import _match_from, _parse_pattern

# ---------------------------------------------------------------- tokenizer

sql_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


@settings(max_examples=300)
@given(sql_text)
def test_tokenizer_roundtrip_lossless(s):
    assert render(tokenize(s)) == s


@settings(max_examples=100)
@given(st.text(alphabet="abc'\"- /*", max_size=60))
def test_tokenizer_roundtrip_quote_heavy(s):
    assert render(tokenize(s)) == s


# -------------------------------------------------------------------- NFA

PATTERNS = [
    "A",
    "A B",
    "A+",
    "A+ B",
    "A B+ C",
    "A (B | C)",
    "(A | B)+ C",
    "A B? C",
    "A B* C",
    "A+ B+",
    "(A B)+",
    "A (B C)* D",
]


def _regex_of(pattern: str) -> str:
    # our pattern grammar over single-char labels maps 1:1 onto re syntax
    return pattern.replace(" ", "")


def _nfa_matches(pattern: str, symbols: str):
    ast = _parse_pattern(pattern)
    n = len(symbols)

    def test(label, i, start):
        return symbols[i] == label

    out = []
    row = 0
    while row < n:
        labels = []
        end = next(_match_from(ast, row, n, test, row, labels), None)
        if end is not None and end > row:
            out.append((row, end))
            row = end
        else:
            row += 1
    return out


def _re_matches(pattern: str, symbols: str):
    return [
        (m.start(), m.end())
        for m in re.finditer(_regex_of(pattern), symbols)
        if m.end() > m.start()
    ]


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(PATTERNS), st.text(alphabet="ABCD", max_size=18))
def test_nfa_agrees_with_re(pattern, symbols):
    assert _nfa_matches(pattern, symbols) == _re_matches(pattern, symbols)


# ----------------------------------------------------------- format patterns

KNOWN = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%i": "mm", "%s": "ss"}


@settings(max_examples=100)
@given(st.lists(st.sampled_from(sorted(KNOWN) + ["-", ":", "/", " "]), max_size=10))
def test_mysql_pattern_translation_compositional(parts):
    src = "".join(parts)
    out = mysql_to_java(src)
    for k, v in KNOWN.items():
        src_count = src.count(k)
        assert out.count(v) >= src_count  # each directive translated
