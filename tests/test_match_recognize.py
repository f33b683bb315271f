"""Unit tests for the MATCH_RECOGNIZE NFA (parser + matcher) plus the
oracle-backed funnel query is covered by test_oracle_diff."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from trino_spark.operators.match_recognize import (
    _match_from,
    _parse_pattern,
    match_recognize,
)


def _matches(pattern: str, symbols: str) -> list[tuple[int, int, list[str]]]:
    """Run the matcher over a string of single-char labels; returns
    (start, end, labels) per non-overlapping greedy match."""
    ast = _parse_pattern(pattern)
    n = len(symbols)

    def test(label, i, start):
        return symbols[i] == label

    out = []
    row = 0
    while row < n:
        labels: list[str] = []
        end = next(_match_from(ast, row, n, test, row, labels), None)
        if end is not None and end > row:
            out.append((row, end, list(labels)))
            row = end
        else:
            row += 1
    return out


def test_concat_and_plus_greedy():
    assert _matches("A B", "AABAB") == [(1, 3, ["A", "B"]), (3, 5, ["A", "B"])]
    assert _matches("A+ B", "AAAB") == [(0, 4, ["A", "A", "A", "B"])]


def test_alternation_and_optional():
    assert _matches("A (B | C) D", "ABD ACD".replace(" ", "X")) == [
        (0, 3, ["A", "B", "D"]),
        (4, 7, ["A", "C", "D"]),
    ]
    # optional: greedy takes B when present, skips when absent
    assert _matches("A B? D", "ABD") == [(0, 3, ["A", "B", "D"])]
    assert _matches("A B? D", "AD") == [(0, 2, ["A", "D"])]


def test_star_and_skip_past_last_row():
    ms = _matches("A B* C", "ABBBCAC")
    assert ms == [(0, 5, ["A", "B", "B", "B", "C"]), (5, 7, ["A", "C"])]


def test_backtracking_shrinks_greedy_quantifier():
    # A+ must give back one A so the trailing "A C" can complete the match
    assert _matches("A+ C", "AAC") == [(0, 3, ["A", "A", "C"])]


def test_match_recognize_dataframe(spark):
    pdf = pd.DataFrame(
        {
            "k": [1] * 6 + [2] * 3,
            "seq": [0, 1, 2, 3, 4, 5, 0, 1, 2],
            "et": ["v", "v", "p", "x", "v", "p", "v", "x", "p"],
        }
    )
    df = spark.createDataFrame(pdf)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("match_no", T.LongType()),
            T.StructField("n_v", T.LongType()),
        ]
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="V+ P",
        define={
            "V": lambda p, i, s: p["et"].iat[i] == "v",
            "P": lambda p, i, s: p["et"].iat[i] == "p",
        },
        measures={"n_v": lambda sl, labels: labels.count("V")},
        output_schema=schema,
    ).orderBy("k", "match_no")
    rows = [(r.k, r.match_no, r.n_v) for r in out.collect()]
    # k=1: (v v p) then (v p); k=2: the x breaks contiguity -> no match
    assert rows == [(1, 1, 2), (1, 2, 1)]
