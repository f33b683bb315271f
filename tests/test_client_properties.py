"""Property-based tests (hypothesis) for the DBAPI client's literal
binding and the CLI statement splitter — pure-Python hot paths where a
quoting bug silently corrupts queries."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from trino_spark import cli
from trino_spark import client as dbapi

_text = st.text(
    alphabet=string.ascii_letters + string.digits + " '\";?-\n,.()",
    max_size=60,
)


@given(st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_escaped_string_roundtrips_quote_structure(s):
    lit = dbapi._escape_param(s)
    assert lit.startswith("'") and lit.endswith("'")
    body = lit[1:-1]
    # every original quote is doubled; un-doubling restores the input
    assert body.replace("''", "'") == s
    # no UNescaped quote remains (scan outside doubled pairs)
    i, n = 0, len(body)
    while i < n:
        if body[i] == "'":
            assert i + 1 < n and body[i + 1] == "'", lit
            i += 2
        else:
            i += 1


@given(st.lists(st.one_of(st.integers(), st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=10), st.none()), max_size=4))
@settings(max_examples=100, deadline=None)
def test_bind_consumes_exactly_the_placeholders(params):
    sql = "SELECT " + ", ".join(["?"] * len(params)) + (" 1" if not params else "")
    bound = dbapi._bind(sql, params)
    assert "?" not in _strip_literals(bound)


def _strip_literals(sql: str) -> str:
    out, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] == "'":
            i += 1
            while i < n:
                if sql[i] == "'" and i + 1 < n and sql[i + 1] == "'":
                    i += 2
                elif sql[i] == "'":
                    i += 1
                    break
                else:
                    i += 1
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


@given(st.lists(_text.filter(lambda s: s.strip()), min_size=1, max_size=5))
@settings(max_examples=150, deadline=None)
def test_split_statements_rejoins_to_original_content(stmts):
    # build a script from statements that contain no top-level ';'
    clean = []
    for s in stmts:
        # only valid standalone fragments: balanced quotes, no comment
        # opener (a trailing '--' would swallow the joining ';'), and no
        # top-level ';' of their own
        if s.count("'") % 2 or s.count('"') % 2 or "--" in s:
            continue
        parts, rest = cli.split_statements(s)
        if parts:
            continue
        if rest.strip():
            clean.append(rest.strip())
    script = "; ".join(clean) + ";"
    got, tail = cli.split_statements(script)
    assert not tail.strip()
    assert got == clean


@given(_text)
@settings(max_examples=200, deadline=None)
def test_split_never_loses_content_outside_separators(buf):
    stmts, rest = cli.split_statements(buf)
    # joining back with ';' preserves every non-separator character count
    rebuilt = ";".join(stmts + [rest])
    stripped = [c for c in buf if c != ";"]
    rebuilt_s = [c for c in rebuilt if c != ";"]
    # whitespace-only statements are dropped by design; compare non-space
    assert [c for c in rebuilt_s if not c.isspace()] == [
        c for c in stripped if not c.isspace()
    ]
