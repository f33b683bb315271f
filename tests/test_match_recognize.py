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


def test_bounded_quantifier_greedy():
    # greedy takes 3 when available, leftover single A can't reach lo=2
    assert _matches("A{2,3}", "AAAA") == [(0, 3, ["A", "A", "A"])]
    assert _matches("A{2,3}", "AAAAA") == [(0, 3, ["A"] * 3), (3, 5, ["A"] * 2)]
    assert _matches("A{2}", "AAA") == [(0, 2, ["A", "A"])]
    assert _matches("A{2,}", "AAAAA") == [(0, 5, ["A"] * 5)]
    # backtracking: A{2,3} gives back the third A so C can match
    assert _matches("A{2,3} C", "AAAC") == [(0, 4, ["A", "A", "A", "C"])]
    assert _matches("A{2,3} C", "AAC") == [(0, 3, ["A", "A", "C"])]


def test_reluctant_quantifiers():
    # lazy + takes as few as possible
    assert _matches("A+?", "AAA") == [(0, 1, ["A"]), (1, 2, ["A"]), (2, 3, ["A"])]
    assert _matches("A+", "AAA") == [(0, 3, ["A"] * 3)]
    assert _matches("A{1,3}?", "AAA") == [(0, 1, ["A"]), (1, 2, ["A"]), (2, 3, ["A"])]
    # lazy opt prefers absence, still completes via backtracking
    assert _matches("A B?? C", "ABC") == [(0, 3, ["A", "B", "C"])]
    assert _matches("A B?? C", "AC") == [(0, 2, ["A", "C"])]
    # lazy still expands when the continuation requires it
    assert _matches("A+? B", "AAB") == [(0, 3, ["A", "A", "B"])]


def test_permute():
    assert _matches("PERMUTE(A, B)", "AB") == [(0, 2, ["A", "B"])]
    assert _matches("PERMUTE(A, B)", "BA") == [(0, 2, ["B", "A"])]
    assert _matches("PERMUTE(A, B, C)", "CAB") == [(0, 3, ["C", "A", "B"])]
    # non-overlap + skip past last
    assert _matches("PERMUTE(A, B)", "ABBA") == [(0, 2, ["A", "B"]), (2, 4, ["B", "A"])]


def test_all_rows_per_match_dataframe(spark):
    pdf = pd.DataFrame(
        {
            "k": [1] * 5,
            "seq": [0, 1, 2, 3, 4],
            "et": ["s", "h", "h", "h", "x"],
        }
    )
    df = spark.createDataFrame(pdf)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("match_no", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("cls", T.StringType()),
            T.StructField("run_n", T.LongType()),
        ]
    )
    out = match_recognize(
        df,
        partition_by=["k"],
        order_by=["seq"],
        pattern="S H{2,3}",
        define={},
        define_vectorized={
            "S": lambda p: p["et"] == "s",
            "H": lambda p: p["et"] == "h",
        },
        measures={
            "seq": lambda sl, labels: int(sl["seq"].iloc[-1]),
            "cls": lambda sl, labels: labels[-1],
            "run_n": lambda sl, labels: len(labels),
        },
        output_schema=schema,
        rows_per_match="all",
    ).orderBy("seq")
    rows = [(r.k, r.match_no, r.seq, r.cls, r.run_n) for r in out.collect()]
    assert rows == [
        (1, 1, 0, "S", 1),
        (1, 1, 1, "H", 2),
        (1, 1, 2, "H", 3),
        (1, 1, 3, "H", 4),
    ]


def _matches_next_row(pattern, symbols):
    """Overlapping-scan harness (AFTER MATCH SKIP TO NEXT ROW)."""
    from trino_spark.operators.match_recognize import _match_from, _parse_pattern

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
            out.append((row, end, list(labels)))
        row += 1
    return out


def test_skip_to_next_row_overlapping(spark):
    pdf = pd.DataFrame({"k": [1] * 4, "seq": [0, 1, 2, 3], "et": ["a", "a", "a", "b"]})
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("match_no", T.LongType()),
            T.StructField("start_seq", T.LongType()),
            T.StructField("len", T.LongType()),
        ]
    )
    kw = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern="A+ B",
        define={},
        define_vectorized={"A": lambda p: p["et"] == "a", "B": lambda p: p["et"] == "b"},
        measures={
            "start_seq": lambda sl, labels: int(sl["seq"].iloc[0]),
            "len": lambda sl, labels: len(labels),
        },
        output_schema=schema,
    )
    past = match_recognize(spark.createDataFrame(pdf), **kw).collect()
    nxt = match_recognize(spark.createDataFrame(pdf), after_match="next_row", **kw).collect()
    # past-last: one greedy match consuming everything
    assert [(r.start_seq, r.len) for r in past] == [(0, 4)]
    # next-row: overlapping matches starting at every 'a'
    assert sorted((r.start_seq, r.len) for r in nxt) == [(0, 4), (1, 3), (2, 2)]


def test_skip_to_last_label(spark):
    # W+ U: rises then one fall; SKIP TO LAST W resumes AT the last rise row
    # so the falling row starts the next match's W run — classic V-shapes.
    pdf = pd.DataFrame(
        {"k": [1] * 7, "seq": list(range(7)), "v": [1, 2, 3, 2, 3, 4, 2]}
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("match_no", T.LongType()),
            T.StructField("start_seq", T.LongType()),
            T.StructField("end_seq", T.LongType()),
        ]
    )
    kw = dict(
        partition_by=["k"],
        order_by=["seq"],
        pattern="W W+ U",
        define={
            "W": lambda g, i, s: i == s or g["v"].iloc[i] > g["v"].iloc[i - 1],
            "U": lambda g, i, s: g["v"].iloc[i] < g["v"].iloc[i - 1],
        },
        measures={
            "start_seq": lambda sl, labels: int(sl["seq"].iloc[0]),
            "end_seq": lambda sl, labels: int(sl["seq"].iloc[-1]),
        },
        output_schema=schema,
    )
    past = match_recognize(spark.createDataFrame(pdf), **kw).collect()
    assert [(r.start_seq, r.end_seq) for r in past] == [(0, 3), (4, 6)]
    to_last = match_recognize(
        spark.createDataFrame(pdf), after_match="to_last:W", **kw
    ).collect()
    # resume at seq=2 (last W of match 1): row 3 re-qualifies as fall? No —
    # the second match rises 3->4 from seq 3's value 2: (2,3)(3,2)... next
    # match starts at seq 2 (v=3): W at start, then seq 3 v=2 not a rise ->
    # no W+; backtrack fails; scanning advances. Next full match: 3..6.
    assert [(r.start_seq, r.end_seq) for r in to_last] == [(0, 3), (3, 6)]


def test_skip_to_first_label_errors_on_first_row(spark):
    pdf = pd.DataFrame({"k": [1, 1, 1], "seq": [0, 1, 2], "et": ["a", "a", "b"]})
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("match_no", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    with pytest.raises(Exception, match="first row"):
        match_recognize(
            spark.createDataFrame(pdf),
            partition_by=["k"],
            order_by=["seq"],
            pattern="A+ B",
            define={"A": lambda g, i, s: g["et"].iloc[i] == "a",
                    "B": lambda g, i, s: g["et"].iloc[i] == "b"},
            measures={"n": lambda sl, labels: len(labels)},
            output_schema=schema,
            after_match="to_first:A",
        ).collect()
