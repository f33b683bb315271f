"""MATCH_RECOGNIZE (row-pattern matching) — a Trino operator with no Spark
equivalent (SURVEY.md §2.5), implemented as an applyInPandas NFA.

Reference semantics: grammar SqlBase.g4:448, plan node
core/trino-main/.../planner/plan/PatternRecognitionNode.java:47, NFA matcher
core/trino-main/.../operator/window/matcher/Matcher.java and label
evaluation window/pattern/LabelEvaluator.java. Subset implemented:

- PARTITION BY / ORDER BY
- PATTERN over labels with concatenation, alternation `|`, grouping,
  quantifiers `* + ?` (greedy)
- DEFINE: per-label vectorized predicates over the ordered partition
  (receive the pandas frame plus the candidate row index and the match's
  current start index — enough for PREV/FIRST-style conditions)
- ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW
- MEASURES computed from the matched slice + label assignment

Scale notes: one shuffle on the partition keys; each group is matched
in-memory in a single Arrow batch (applyInPandas), which is the same
locality contract Trino's WindowOperator gives MATCH_RECOGNIZE — a
partition must fit on one worker. Backtracking is bounded per match start
and resumes PAST LAST ROW, so total work is O(rows × pattern states) for
non-pathological patterns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# --------------------------------------------------------------- pattern AST


@dataclass
class _Node:
    kind: str  # label | seq | alt | star | plus | opt
    label: str | None = None
    kids: tuple["_Node", ...] = ()


def _parse_pattern(pattern: str) -> _Node:
    """Parse `A B+ (C | D)* E?` into an AST."""
    s = pattern
    toks: list[str] = []
    j = 0
    while j < len(s):
        c = s[j]
        if c.isspace():
            j += 1
        elif c in "()|*+?":
            toks.append(c)
            j += 1
        else:
            k = j
            while k < len(s) and (s[k].isalnum() or s[k] == "_"):
                k += 1
            toks.append(s[j:k])
            j = k

    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def eat() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_alt() -> _Node:
        parts = [parse_seq()]
        while peek() == "|":
            eat()
            parts.append(parse_seq())
        return parts[0] if len(parts) == 1 else _Node("alt", kids=tuple(parts))

    def parse_seq() -> _Node:
        items: list[_Node] = []
        while peek() is not None and peek() not in ")|":
            items.append(parse_quant())
        return items[0] if len(items) == 1 else _Node("seq", kids=tuple(items))

    def parse_quant() -> _Node:
        atom = parse_atom()
        while peek() in ("*", "+", "?"):
            q = eat()
            atom = _Node({"*": "star", "+": "plus", "?": "opt"}[q], kids=(atom,))
        return atom

    def parse_atom() -> _Node:
        t = eat()
        if t == "(":
            inner = parse_alt()
            assert eat() == ")", "unbalanced pattern parens"
            return inner
        return _Node("label", label=t)

    root = parse_alt()
    assert pos == len(toks), f"trailing pattern tokens: {toks[pos:]}"
    return root


def _match_from(
    node: _Node,
    row: int,
    n: int,
    test: Callable[[str, int, int], bool],
    start: int,
    labels: list[str],
):
    """Yield (end_row_exclusive) for matches of `node` beginning at `row`,
    greedy-first. `labels` accumulates the per-row label assignment."""
    if node.kind == "label":
        if row < n and test(node.label, row, start):
            labels.append(node.label)
            yield row + 1
            labels.pop()
        return
    if node.kind == "seq":
        def seq_match(idx: int, r: int):
            if idx == len(node.kids):
                yield r
                return
            for mid in _match_from(node.kids[idx], r, n, test, start, labels):
                yield from seq_match(idx + 1, mid)

        yield from seq_match(0, row)
        return
    if node.kind == "alt":
        for kid in node.kids:
            yield from _match_from(kid, row, n, test, start, labels)
        return
    if node.kind == "opt":
        yield from _match_from(node.kids[0], row, n, test, start, labels)
        yield row
        return
    if node.kind in ("plus", "star"):
        def repeat(r: int):
            for mid in _match_from(node.kids[0], r, n, test, start, labels):
                if mid > r:  # guard zero-width loops
                    yield from repeat(mid)
                yield mid

        yield from repeat(row)
        if node.kind == "star":
            yield row
        return
    raise AssertionError(node.kind)


# ----------------------------------------------------------------- operator


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: str,
    define: dict[str, Callable[[pd.DataFrame, int, int], bool]],
    measures: dict[str, Callable[[pd.DataFrame, list[str]], object]],
    output_schema: StructType,
    define_vectorized: dict[str, Callable[[pd.DataFrame], object]] | None = None,
) -> DataFrame:
    """ONE ROW PER MATCH / SKIP PAST LAST ROW row-pattern matching.

    define[label](pdf, i, start) -> bool: does ordered row i qualify as
    `label` for a match that began at `start`?
    define_vectorized[label](pdf) -> bool array: start-independent labels
    evaluated once per partition (numpy mask) instead of per NFA probe —
    use for PREV-free predicates; falls back to `define` per label.
    measures[name](matched_pdf, labels) -> value for the output row.
    Undefined labels match any row (Trino's default `true` definition).
    """
    ast = _parse_pattern(pattern)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        masks = {}
        for lbl, fn in (define_vectorized or {}).items():
            m = fn(pdf)
            masks[lbl] = m.to_numpy() if hasattr(m, "to_numpy") else m

        def test(label: str, i: int, start: int) -> bool:
            m = masks.get(label)
            if m is not None:
                return bool(m[i])
            fn = define.get(label)
            return True if fn is None else bool(fn(pdf, i, start))

        out_rows = []
        match_no = 0
        row = 0
        while row < n:
            labels: list[str] = []
            end = next(_match_from(ast, row, n, test, row, labels), None)
            if end is not None and end > row:
                match_no += 1
                sl = pdf.iloc[row:end]
                rec = {k: pdf.iloc[row][k] for k in partition_by}
                rec["match_no"] = match_no
                for name, fn in measures.items():
                    rec[name] = fn(sl, list(labels))
                out_rows.append(rec)
                row = end  # AFTER MATCH SKIP PAST LAST ROW
            else:
                row += 1
        cols = [f.name for f in output_schema.fields]
        return pd.DataFrame(out_rows, columns=cols) if out_rows else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in cols}
        )

    return df.repartition(*[F.col(c) for c in partition_by]).groupBy(*partition_by).applyInPandas(
        process, schema=output_schema
    )
