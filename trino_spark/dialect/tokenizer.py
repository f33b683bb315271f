"""Minimal SQL tokenizer for the dialect rewrites.

Token kinds: WORD (identifiers/keywords), NUM, STR ('..' with '' escapes),
QIDENT ("..".. quoted identifiers), SYM (operators/punctuation), WS
(whitespace+comments, preserved verbatim so translation is round-trippable).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Tok:
    kind: str  # WORD | NUM | STR | QIDENT | SYM | WS
    text: str

    def is_word(self, *names: str) -> bool:
        return self.kind == "WORD" and self.text.upper() in names

    def is_sym(self, s: str) -> bool:
        return self.kind == "SYM" and self.text == s


_TWO_CHAR = {"<=", ">=", "<>", "!=", "||", "->", "=>", ":="}


def tokenize(sql: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            j = i
            while j < n and sql[j].isspace():
                j += 1
            toks.append(Tok("WS", sql[i:j]))
            i = j
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j < 0 else j + 1
            toks.append(Tok("WS", sql[i:j]))
            i = j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            toks.append(Tok("WS", sql[i:j]))
            i = j
        elif c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            toks.append(Tok("STR", sql[i : j + 1]))
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and sql[j] != '"':
                j += 1
            toks.append(Tok("QIDENT", sql[i : j + 1]))
            i = j + 1
        elif c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            while j < n and (sql[j].isdigit() or sql[j] in ".eE" or (sql[j] in "+-" and sql[j - 1] in "eE")):
                j += 1
            toks.append(Tok("NUM", sql[i:j]))
            i = j
        elif c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            word = sql[i:j]
            # X'AB' hex literal: keep as one token
            if word.upper() == "X" and j < n and sql[j] == "'":
                k = sql.find("'", j + 1)
                k = n - 1 if k < 0 else k
                toks.append(Tok("STR", sql[i : k + 1]))
                i = k + 1
            else:
                toks.append(Tok("WORD", word))
                i = j
        else:
            two = sql[i : i + 2]
            if two in _TWO_CHAR:
                toks.append(Tok("SYM", two))
                i += 2
            else:
                toks.append(Tok("SYM", c))
                i += 1
    return toks


def render(toks: list[Tok]) -> str:
    return "".join(t.text for t in toks)


def next_code(toks: list[Tok], i: int) -> int:
    """Index of the next non-WS token at or after i (len(toks) if none)."""
    while i < len(toks) and toks[i].kind == "WS":
        i += 1
    return i


def prev_code(toks: list[Tok], i: int) -> int:
    """Index of the previous non-WS token at or before i (-1 if none)."""
    while i >= 0 and toks[i].kind == "WS":
        i -= 1
    return i


def match_paren(toks: list[Tok], open_i: int) -> int:
    """Given index of '(', return index of its matching ')'."""
    depth = 0
    for j in range(open_i, len(toks)):
        if toks[j].is_sym("("):
            depth += 1
        elif toks[j].is_sym(")"):
            depth -= 1
            if depth == 0:
                return j
    raise ValueError("unbalanced parentheses")


def split_args(toks: list[Tok], open_i: int, close_i: int) -> list[tuple[int, int]]:
    """Split the token span inside (open_i, close_i) on top-level commas.
    Returns [(start, end_exclusive)] spans; empty list for zero args."""
    spans: list[tuple[int, int]] = []
    depth = 0
    start = open_i + 1
    if next_code(toks, start) == close_i:
        return []
    for j in range(open_i + 1, close_i):
        if toks[j].is_sym("(") or toks[j].is_sym("["):
            depth += 1
        elif toks[j].is_sym(")") or toks[j].is_sym("]"):
            depth -= 1
        elif depth == 0 and toks[j].is_sym(","):
            spans.append((start, j))
            start = j + 1
    spans.append((start, close_i))
    return spans
