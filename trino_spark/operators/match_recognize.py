"""MATCH_RECOGNIZE (row-pattern matching) — a Trino operator with no Spark
equivalent (SURVEY.md §2.5), implemented over Arrow batches.

Reference semantics: grammar SqlBase.g4:448, plan node
core/trino-main/.../planner/plan/PatternRecognitionNode.java:47, NFA matcher
core/trino-main/.../operator/window/matcher/Matcher.java and label
evaluation window/pattern/LabelEvaluator.java. Subset implemented:

- PARTITION BY / ORDER BY
- PATTERN over labels with concatenation, alternation `|`, grouping,
  quantifiers `* + ?` (greedy), bounded `{n}` `{n,}` `{n,m}`, reluctant
  variants (`*?` `+?` `??` `{n,m}?`), and PERMUTE(...) (expanded to the
  alternation of all orderings, Trino's documented preference order)
- DEFINE: per-label predicates over the ordered partition (row-at-a-time
  lambdas, or vectorized start-independent masks)
- ONE ROW PER MATCH and ALL ROWS PER MATCH (RUNNING measure semantics),
  AFTER MATCH SKIP PAST LAST ROW
- MEASURES computed from the matched slice + label assignment

Execution strategy (mirrors Trino's two-tier matcher, Matcher.java compiles
the pattern to a program the same way):

1. One shuffle on the partition keys, sort within partitions, then a SINGLE
   `mapInPandas` pass streams every group through one Python worker call per
   Spark partition — not one call per group, which drowns small groups in
   per-call Arrow overhead.
2. When every pattern label is start-independent (vectorized DEFINE or
   undefined-ie-always-true), the pattern is compiled to a Python regex over
   a per-row label-bitmask character string. `re.finditer` has exactly our
   greedy / leftmost / non-overlapping semantics (property-tested in
   tests/test_properties.py), and runs the match loop in C.
3. Otherwise (PREV/start-dependent DEFINE lambdas) the backtracking NFA
   interpreter below runs row-at-a-time — the general fallback.

Scale notes: a partition group must fit on one worker — the same locality
contract Trino's WindowOperator gives MATCH_RECOGNIZE. Groups larger than
one Arrow batch are re-assembled by the stream buffer, so batch size does
not bound group size.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

# --------------------------------------------------------------- pattern AST


@dataclass
class _Node:
    kind: str  # label | seq | alt | star | plus | opt | rep
    label: str | None = None
    kids: tuple["_Node", ...] = ()
    lo: int = 0  # rep only
    hi: int | None = None  # rep only; None = unbounded
    lazy: bool = False  # reluctant quantifier (trailing ?)


def _parse_pattern(pattern: str) -> _Node:
    """Parse `A B+ (C | D)* E? F{2,3} G+? PERMUTE(H, I)` into an AST.

    Grammar parity (SqlBase.g4:448 patternQuantifier/patternPrimary):
    concatenation, alternation, grouping, `* + ?`, bounded `{n}` `{n,}`
    `{n,m}`, reluctant variants (trailing `?`), and PERMUTE(p1, ..., pk)
    expanded to the alternation of all orderings in Trino's documented
    preference order (lexicographic by argument position)."""
    s = pattern
    toks: list[str] = []
    j = 0
    while j < len(s):
        c = s[j]
        if c.isspace():
            j += 1
        elif c == "{":
            k = s.index("}", j)
            toks.append(s[j : k + 1])
            j = k + 1
        elif c in "()|*+?,":
            toks.append(c)
            j += 1
        else:
            k = j
            while k < len(s) and (s[k].isalnum() or s[k] == "_"):
                k += 1
            assert k > j, f"bad pattern char {c!r}"
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
        while peek() is not None and peek() not in ")|,":
            items.append(parse_quant())
        return items[0] if len(items) == 1 else _Node("seq", kids=tuple(items))

    def parse_quant() -> _Node:
        atom = parse_atom()
        while (p := peek()) is not None and (p in "*+?" or p.startswith("{")):
            q = eat()
            if q.startswith("{"):
                body = q[1:-1]
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo = int(lo_s)
                    hi = int(hi_s) if hi_s.strip() else None
                else:
                    lo = hi = int(body)
                assert hi is None or hi >= lo, f"bad quantifier bounds {q}"
                atom = _Node("rep", kids=(atom,), lo=lo, hi=hi)
            else:
                atom = _Node({"*": "star", "+": "plus", "?": "opt"}[q], kids=(atom,))
            if peek() == "?":  # reluctant
                eat()
                atom = _Node(atom.kind, kids=atom.kids, lo=atom.lo, hi=atom.hi, lazy=True)
        return atom

    def parse_atom() -> _Node:
        t = eat()
        if t == "(":
            inner = parse_alt()
            assert eat() == ")", "unbalanced pattern parens"
            return inner
        if t.upper() == "PERMUTE":
            from itertools import permutations

            assert eat() == "(", "PERMUTE requires parenthesized arguments"
            parts = [parse_alt()]
            while peek() == ",":
                eat()
                parts.append(parse_alt())
            assert eat() == ")", "unbalanced PERMUTE parens"
            if len(parts) == 1:
                return parts[0]
            alts = tuple(_Node("seq", kids=tuple(p)) for p in permutations(parts))
            return _Node("alt", kids=alts)
        return _Node("label", label=t)

    root = parse_alt()
    assert pos == len(toks), f"trailing pattern tokens: {toks[pos:]}"
    return root


def _labels_of(node: _Node) -> set[str]:
    if node.kind == "label":
        return {node.label}
    out: set[str] = set()
    for k in node.kids:
        out |= _labels_of(k)
    return out


def _to_regex(node: _Node, bit: dict[str, int], nmasks: int) -> str:
    """Compile the pattern AST to a regex over bitmask characters
    chr(0x100 + m): label L matches every mask char containing L's bit."""
    if node.kind == "label":
        b = bit[node.label]
        chars = "".join(chr(0x100 + m) for m in range(nmasks) if m & b)
        return "[" + chars + "]" if chars else "[^\\s\\S]"
    if node.kind == "seq":
        return "".join(_to_regex(k, bit, nmasks) for k in node.kids)
    if node.kind == "alt":
        return "(?:" + "|".join(_to_regex(k, bit, nmasks) for k in node.kids) + ")"
    if node.kind == "rep":
        hi = "" if node.hi is None else node.hi
        q = f"{{{node.lo},{hi}}}" if node.hi != node.lo else f"{{{node.lo}}}"
    else:
        q = {"star": "*", "plus": "+", "opt": "?"}[node.kind]
    if node.lazy:
        q += "?"
    return "(?:" + _to_regex(node.kids[0], bit, nmasks) + ")" + q


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
        if node.lazy:
            yield row
            yield from _match_from(node.kids[0], row, n, test, start, labels)
        else:
            yield from _match_from(node.kids[0], row, n, test, start, labels)
            yield row
        return
    if node.kind in ("plus", "star"):
        def repeat(r: int):
            for mid in _match_from(node.kids[0], r, n, test, start, labels):
                if node.lazy:
                    yield mid
                if mid > r:  # guard zero-width loops
                    yield from repeat(mid)
                if not node.lazy:
                    yield mid

        if node.kind == "star" and node.lazy:
            yield row
        yield from repeat(row)
        if node.kind == "star" and not node.lazy:
            yield row
        return
    if node.kind == "rep":
        lo, hi = node.lo, node.hi

        def rep_from(r: int, cnt: int):
            """Greedy (or lazy) bounded repetition ending positions."""
            can_more = hi is None or cnt < hi
            if node.lazy and cnt >= lo:
                yield r
            if can_more:
                for mid in _match_from(node.kids[0], r, n, test, start, labels):
                    if mid > r:
                        yield from rep_from(mid, cnt + 1)
                    elif cnt + 1 >= lo and not node.lazy:
                        # zero-width kid: counts toward lo but can't recurse
                        yield mid
            if not node.lazy and cnt >= lo:
                yield r
        yield from rep_from(row, 0)
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
    measures_vectorized: Callable[
        [pd.DataFrame, np.ndarray, np.ndarray, dict[str, np.ndarray]], dict
    ]
    | None = None,
    rows_per_match: str = "one",
    measures_vectorized_all: Callable[
        [pd.DataFrame, np.ndarray, np.ndarray, np.ndarray], dict
    ]
    | None = None,
    after_match: str = "past_last",
) -> DataFrame:
    """ONE ROW PER MATCH / ALL ROWS PER MATCH, SKIP PAST LAST ROW.

    rows_per_match="all" emits one output row per MATCHED INPUT ROW
    (unmatched rows are omitted — Trino's ALL ROWS PER MATCH default,
    SqlBase.g4 rowsPerMatch); measures are evaluated with RUNNING
    semantics: fn(prefix_slice, labels_prefix) where the slice ends at the
    current row, so labels_prefix[-1] is CLASSIFIER() of that row.

    after_match="next_row" resumes scanning at match-start + 1 (AFTER
    MATCH SKIP TO NEXT ROW — overlapping matches); default "past_last" is
    SKIP PAST LAST ROW; "to_first:<L>" / "to_last:<L>" resume AT the
    first/last row the match labeled L (AFTER MATCH SKIP TO [FIRST|LAST]
    <label>, erroring when L is absent or would re-start at the match's
    first row, like the reference).

    define[label](pdf, i, start) -> bool: does ordered row i qualify as
    `label` for a match that began at `start`? (group-local pdf/indices)
    define_vectorized[label](pdf) -> bool array: start-independent labels
    evaluated once per Arrow chunk. When every pattern label is vectorized
    (or undefined = always true), matching compiles to a C-speed regex.
    measures[name](matched_pdf, labels) -> value per output row.
    measures_vectorized(chunk_pdf, starts, ends, masks) -> column dict for
    all matches at once (fast path only); overrides `measures` when usable.
    Undefined labels match any row (Trino's default `true` definition).
    """
    ast = _parse_pattern(pattern)
    pat_labels = sorted(_labels_of(ast))
    vec = dict(define_vectorized or {})
    fast = (
        len(pat_labels) <= 8
        and after_match in ("past_last", "next_row")
        and rows_per_match != "all_with_unmatched"
        and all((l in vec) or (l not in define) for l in pat_labels)
    )
    bit = {l: 1 << i for i, l in enumerate(pat_labels)}
    nmasks = 1 << len(pat_labels)
    rx = re.compile(_to_regex(ast, bit, nmasks)) if fast else None
    # mask value -> its unique pattern label, or None if 0 or 2+ candidates
    # (ambiguous rows fall back to an NFA replay to recover the assignment)
    only_label: list[str | None] = [None] * nmasks
    for m in range(nmasks):
        cands = [l for l in pat_labels if m & bit[l]]
        only_label[m] = cands[0] if len(cands) == 1 else None
    out_cols = [f.name for f in output_schema.fields]

    def _masks(pdf: pd.DataFrame) -> dict[str, np.ndarray]:
        n = len(pdf)
        masks: dict[str, np.ndarray] = {}
        for l in pat_labels:
            if l in vec:
                m = vec[l](pdf)
                masks[l] = np.asarray(
                    m.to_numpy() if hasattr(m, "to_numpy") else m, dtype=bool
                )
            elif l not in define:
                masks[l] = np.ones(n, dtype=bool)
        return masks

    def _chunk_fast(pdf: pd.DataFrame, starts: np.ndarray, ends: np.ndarray):
        masks = _masks(pdf)
        bm = np.zeros(len(pdf), dtype=np.int64)
        for l in pat_labels:
            bm |= masks[l].astype(np.int64) * bit[l]
        sym = (bm + 0x100).tolist()
        a_idx: list[int] = []
        b_idx: list[int] = []
        match_no: list[int] = []
        for gs, ge in zip(starts, ends):
            text = "".join(map(chr, sym[gs:ge]))
            cnt = 0
            if after_match == "next_row":
                # overlapping matches: try every start position
                pos = 0
                while pos < len(text):
                    m = rx.match(text, pos)
                    if m is not None and m.end() > m.start():
                        cnt += 1
                        a_idx.append(gs + m.start())
                        b_idx.append(gs + m.end())
                        match_no.append(cnt)
                    pos += 1
            else:
                for m in rx.finditer(text):
                    ms, me = m.span()
                    if me <= ms:
                        continue
                    cnt += 1
                    a_idx.append(gs + ms)
                    b_idx.append(gs + me)
                    match_no.append(cnt)
        if not a_idx:
            return None
        if rows_per_match == "all":
            if measures_vectorized_all is not None:
                # flat emission: one numpy gather for the whole chunk.
                # measures_vectorized_all(pdf, idx, lengths, labels_flat):
                # idx = source-row index per output row, lengths = rows per
                # match, labels_flat = CLASSIFIER() per output row.
                lengths = np.asarray(b_idx, dtype=np.int64) - np.asarray(a_idx, dtype=np.int64)
                idx = np.concatenate([np.arange(s_, e_) for s_, e_ in zip(a_idx, b_idx)])
                labels_flat = np.concatenate(
                    [np.asarray(_assignment(bm, s_, e_), dtype=object) for s_, e_ in zip(a_idx, b_idx)]
                )
                out = {k: pdf[k].to_numpy()[idx] for k in partition_by}
                out["match_no"] = np.repeat(np.asarray(match_no, dtype=np.int64), lengths)
                out.update(measures_vectorized_all(pdf, idx, lengths, labels_flat))
                return pd.DataFrame(out, columns=out_cols)
            rows: list[dict] = []
            for s_, e_, mno in zip(a_idx, b_idx, match_no):
                labels = _assignment(bm, s_, e_)
                for off in range(e_ - s_):
                    rec = {k: pdf.iloc[s_ + off][k] for k in partition_by}
                    rec["match_no"] = mno
                    sl = pdf.iloc[s_ : s_ + off + 1]
                    for name, fn in measures.items():
                        rec[name] = fn(sl, labels[: off + 1])
                    rows.append(rec)
            return pd.DataFrame(rows, columns=out_cols)
        a = np.asarray(a_idx, dtype=np.int64)
        b = np.asarray(b_idx, dtype=np.int64)
        out = {k: pdf[k].to_numpy()[a] for k in partition_by}
        out["match_no"] = np.asarray(match_no, dtype=np.int64)
        if measures_vectorized is not None:
            out.update(measures_vectorized(pdf, a, b, masks))
        else:
            vals: dict[str, list] = {name: [] for name in measures}
            for s_, e_ in zip(a_idx, b_idx):
                labels = _assignment(bm, s_, e_)
                sl = pdf.iloc[s_:e_]
                for name, fn in measures.items():
                    vals[name].append(fn(sl, labels))
            out.update(vals)
        return pd.DataFrame(out, columns=out_cols)

    def _assignment(bm: np.ndarray, s_: int, e_: int) -> list[str]:
        labels: list[str] = []
        for i in range(s_, e_):
            l = only_label[bm[i]]
            if l is None:
                break
            labels.append(l)
        else:
            return labels
        # ambiguous row: replay the NFA over the (short) matched slice
        labels = []

        def test(label: str, i: int, start: int) -> bool:
            return bool(bm[i] & bit[label])

        next(_match_from(ast, s_, e_, test, s_, labels), None)
        return list(labels)

    def _chunk_slow(pdf: pd.DataFrame, starts: np.ndarray, ends: np.ndarray):
        rows: list[dict] = []
        for gs, ge in zip(starts, ends):
            g = pdf.iloc[gs:ge].reset_index(drop=True)
            n = len(g)
            masks = _masks(g)

            def test(label: str, i: int, start: int) -> bool:
                m = masks.get(label)
                if m is not None:
                    return bool(m[i])
                fn = define.get(label)
                return True if fn is None else bool(fn(g, i, start))

            match_no = 0
            row = 0
            consumed = [False] * n
            while row < n:
                labels: list[str] = []
                end = next(_match_from(ast, row, n, test, row, labels), None)
                if end is not None and end > row:
                    match_no += 1
                    for ci in range(row, end):
                        consumed[ci] = True
                    if rows_per_match in ("all", "all_with_unmatched"):
                        for off in range(end - row):
                            rec = {k: g.iloc[row + off][k] for k in partition_by}
                            rec["match_no"] = match_no
                            sl = g.iloc[row : row + off + 1]
                            for name, fn in measures.items():
                                rec[name] = fn(sl, list(labels)[: off + 1])
                            rows.append(rec)
                    else:
                        sl = g.iloc[row:end]
                        rec = {k: g.iloc[row][k] for k in partition_by}
                        rec["match_no"] = match_no
                        for name, fn in measures.items():
                            rec[name] = fn(sl, list(labels))
                        rows.append(rec)
                    # AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW |
                    # TO FIRST/LAST <label> (grammar SqlBase.g4 skipTo;
                    # matcher/Matcher.java resume semantics)
                    if after_match == "past_last":
                        row = end
                    elif after_match == "next_row":
                        row = row + 1
                    elif after_match.startswith(("to_first:", "to_last:")):
                        mode, _, target = after_match.partition(":")
                        # `A|B` = SUBSET union variable: any member matches
                        tset = set(target.split("|"))
                        hits = [ix for ix, l in enumerate(labels) if l in tset]
                        if not hits:
                            raise ValueError(
                                f"AFTER MATCH SKIP TO {target}: label did not "
                                "participate in the match"
                            )
                        if mode == "to_first":
                            pos = row + hits[0]
                        else:
                            pos = row + hits[-1]
                        if pos == row:
                            # resuming AT the match's first row would loop
                            # forever; the reference raises here too.
                            raise ValueError(
                                f"AFTER MATCH SKIP TO {target} cannot skip to "
                                "the first row of the match"
                            )
                        row = pos
                    else:
                        raise ValueError(f"unknown after_match: {after_match}")
                else:
                    row += 1
            if rows_per_match == "all_with_unmatched":
                # ALL ROWS PER MATCH WITH UNMATCHED ROWS (grammar
                # rowsPerMatch): unmatched input rows pass through with
                # null match_no/measures (empty CLASSIFIER in the
                # reference).
                for ui in range(n):
                    if not consumed[ui]:
                        rec = {k: g.iloc[ui][k] for k in partition_by}
                        rec["match_no"] = None
                        for name in measures:
                            rec[name] = None
                        rows.append(rec)
        return pd.DataFrame(rows, columns=out_cols) if rows else None

    _chunk = _chunk_fast if fast else _chunk_slow

    def _process_chunk(pdf: pd.DataFrame):
        codes = pdf.groupby(partition_by, sort=False).ngroup().to_numpy()
        cuts = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(pdf)]))
        return _chunk(pdf, starts, ends)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Groups are contiguous (sortWithinPartitions) but may straddle Arrow
        # batches; hold the trailing (possibly incomplete) group in `tail`.
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if tail is not None and len(tail):
                pdf = pd.concat([tail, pdf], ignore_index=True)
                tail = None
            if not len(pdf):
                continue
            codes = pdf.groupby(partition_by, sort=False).ngroup().to_numpy()
            cut = int(np.searchsorted(codes, codes[-1]))
            tail = pdf.iloc[cut:].reset_index(drop=True)
            if cut:
                out = _process_chunk(pdf.iloc[:cut].reset_index(drop=True))
                if out is not None:
                    yield out
        if tail is not None and len(tail):
            out = _process_chunk(tail)
            if out is not None:
                yield out

    return (
        df.repartition(*partition_by)
        .sortWithinPartitions(*partition_by, *order_by)
        .mapInPandas(process, schema=output_schema)
    )


def pattern_window(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: str,
    define: dict[str, Callable[[pd.DataFrame, int, int], bool]],
    measures: dict[str, Callable[[pd.DataFrame, list[str]], object]],
    measure_fields: list,
) -> DataFrame:
    """Row-pattern recognition in WINDOW (docs
    pattern-recognition-in-window.md; reference: window specifications
    with MEASURES / PATTERN / DEFINE over the frame ROWS BETWEEN CURRENT
    ROW AND UNBOUNDED FOLLOWING).

    For EVERY input row, the pattern is matched ANCHORED at that row
    (INITIAL mode); on a match the measures evaluate with FINAL
    semantics over the matched rows, otherwise (and for rows where only
    the empty match exists and a measure needs rows) the measure is
    NULL. Output = the input columns + one column per measure, same
    cardinality as the input — unlike the table-form MATCH_RECOGNIZE,
    no row is dropped.

    Scale shape: applyInPandas per (hash-partitioned) window partition,
    like the table form; matching is leftmost-greedy per row via the
    shared NFA. Worst case is O(rows x match length) per partition —
    the reference pays the same (its window matcher re-anchors per
    row)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ast = _parse_pattern(pattern)
    out_schema = StructType(list(df.schema.fields) + list(measure_fields))
    names = list(measures)
    synth = not partition_by
    if synth:
        df = df.withColumn("_pw_all", F.lit(1))
        keys = ["_pw_all"]
    else:
        keys = list(partition_by)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        n = len(g)

        def test(label: str, i: int, start: int) -> bool:
            fn = define.get(label)
            return True if fn is None else fn(g, i, start)

        cols: dict[str, list] = {name: [None] * n for name in names}
        for r in range(n):
            labels: list[str] = []
            end = next(_match_from(ast, r, n, test, r, labels), None)
            if end is None:
                continue
            sl = g.iloc[r:end]
            lbls = list(labels)
            for name in names:
                try:
                    cols[name][r] = measures[name](sl, lbls)
                except (IndexError, TypeError):
                    cols[name][r] = None  # empty match / NULL arithmetic
        for name in names:
            g[name] = cols[name]
        if synth:
            g = g.drop(columns=["_pw_all"])
        return g

    out = df.groupBy(*keys).applyInPandas(
        process,
        schema=StructType(
            [f for f in out_schema.fields if f.name != "_pw_all"]
        ),
    )
    return out
