"""SQL routines: CREATE FUNCTION ... RETURN <expr> as macro expansion.

Reference: Trino's SQL UDFs (docs/src/main/sphinx/udf/sql.md) are analyzed
by core/trino-main/.../sql/routine/SqlRoutineAnalyzer.java and compiled to
bytecode by SqlRoutineCompiler.java:108. For the expression-bodied form
(`RETURN expr`, the overwhelmingly common case) the reference inlines the
expression into the caller's plan (SqlRoutinePlanner.java) — which is
exactly what we do, at the token level, BEFORE dialect translation, so the
body may use Trino-dialect constructs. The inlined expression then flows
through Catalyst like any other (codegen, pushdown, constant folding) —
a routine call costs nothing at scale, unlike an opaque Python UDF.

Control-flow bodies (BEGIN/IF/LOOP — grammar SqlBase.g4:1104) are not
macro-expandable; the supported answer there is a Python function composing
Spark expressions (SURVEY.md §7 M2). We raise a clear error for those.
"""

from __future__ import annotations

from dataclasses import dataclass

from trino_spark.dialect.tokenizer import Tok, match_paren, next_code, render, split_args, tokenize

_MAX_EXPANSION_DEPTH = 10


@dataclass(frozen=True)
class Routine:
    name: str  # upper-cased, unqualified
    params: tuple[str, ...]  # upper-cased parameter names, in order
    body: tuple[Tok, ...]  # RETURN expression tokens (untranslated dialect)


def parse_create_function(sql: str) -> Routine | None:
    """Parse CREATE [OR REPLACE] FUNCTION name(p type, ...) RETURNS type
    [characteristics] RETURN expr. Returns None if `sql` is not a CREATE
    FUNCTION statement; raises on the unsupported BEGIN...END form."""
    toks = tokenize(sql)
    i = next_code(toks, 0)
    if i >= len(toks) or not toks[i].is_word("CREATE"):
        return None
    i = next_code(toks, i + 1)
    if i < len(toks) and toks[i].is_word("OR"):
        i = next_code(toks, i + 1)  # REPLACE
        i = next_code(toks, i + 1)
    if i >= len(toks) or not toks[i].is_word("FUNCTION"):
        return None

    # name: possibly catalog.schema.name — keep the last identifier.
    i = next_code(toks, i + 1)
    name = toks[i].text
    j = next_code(toks, i + 1)
    while j < len(toks) and toks[j].is_sym("."):
        j = next_code(toks, j + 1)
        name = toks[j].text
        j = next_code(toks, j + 1)
    name = name.upper()

    if j >= len(toks) or not toks[j].is_sym("("):
        raise ValueError(f"CREATE FUNCTION {name}: expected parameter list")
    close = match_paren(toks, j)
    params = tuple(
        toks[next_code(toks, s)].text.upper() for s, _ in split_args(toks, j, close)
    )

    # Skip RETURNS type + characteristics until the RETURN keyword.
    k = next_code(toks, close + 1)
    while k < len(toks) and not toks[k].is_word("RETURN"):
        if toks[k].is_word("BEGIN", "IF", "LOOP", "WHILE", "SET"):
            raise ValueError(
                f"CREATE FUNCTION {name}: control-flow routine bodies "
                "(BEGIN/IF/LOOP) are not supported — compose Spark "
                "expressions in Python instead (SURVEY.md §7 M2)"
            )
        k += 1
    if k >= len(toks):
        raise ValueError(f"CREATE FUNCTION {name}: missing RETURN expression")

    body = [t for t in toks[k + 1 :]]
    # trim trailing whitespace/semicolon
    while body and (body[-1].kind == "WS" or body[-1].is_sym(";")):
        body.pop()
    if not body:
        raise ValueError(f"CREATE FUNCTION {name}: empty RETURN expression")
    return Routine(name=name, params=params, body=tuple(body))


def parse_drop_function(sql: str) -> str | None:
    """DROP FUNCTION [IF EXISTS] name -> upper-cased name, else None."""
    toks = tokenize(sql)
    i = next_code(toks, 0)
    if i >= len(toks) or not toks[i].is_word("DROP"):
        return None
    i = next_code(toks, i + 1)
    if i >= len(toks) or not toks[i].is_word("FUNCTION"):
        return None
    i = next_code(toks, i + 1)
    if i < len(toks) and toks[i].is_word("IF"):
        i = next_code(toks, i + 1)  # EXISTS
        i = next_code(toks, i + 1)
    name = toks[i].text
    j = next_code(toks, i + 1)
    while j < len(toks) and toks[j].is_sym("."):
        j = next_code(toks, j + 1)
        name = toks[j].text
        j = next_code(toks, j + 1)
    return name.upper()


def expand(sql: str, routines: dict[str, Routine]) -> str:
    """Inline every registered routine call in `sql` (innermost-last via
    fixpoint iteration, bounded to catch recursive definitions)."""
    if not routines:
        return sql
    for _ in range(_MAX_EXPANSION_DEPTH):
        toks = tokenize(sql)
        out: list[Tok] = []
        i = 0
        changed = False
        while i < len(toks):
            t = toks[i]
            nxt = next_code(toks, i + 1)
            if (
                t.kind == "WORD"
                and t.text.upper() in routines
                and nxt < len(toks)
                and toks[nxt].is_sym("(")
            ):
                r = routines[t.text.upper()]
                close = match_paren(toks, nxt)
                spans = split_args(toks, nxt, close)
                if len(spans) != len(r.params):
                    raise ValueError(
                        f"function {r.name} expects {len(r.params)} arguments, got {len(spans)}"
                    )
                args = {
                    p: toks[s:e] for p, (s, e) in zip(r.params, spans)
                }
                out.append(Tok("SYM", "("))
                for bt in r.body:
                    if bt.kind == "WORD" and bt.text.upper() in args:
                        out.append(Tok("SYM", "("))
                        out.extend(args[bt.text.upper()])
                        out.append(Tok("SYM", ")"))
                    else:
                        out.append(bt)
                out.append(Tok("SYM", ")"))
                i = close + 1
                changed = True
            else:
                out.append(t)
                i += 1
        sql = render(out)
        if not changed:
            return sql
    raise ValueError("routine expansion did not converge (recursive definition?)")
