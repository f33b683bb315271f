"""Differential expression fuzzer: random typed scalar expressions run
through the dialect engine (Trino SQL → translate → Spark) AND DuckDB on
the same text, values compared strictly.

The function sweep (scripts/function_sweep.py) probes functions one at a
time; this fuzzer stresses COMPOSITION — nesting, NULL propagation,
CASE/COALESCE typing, operator precedence — where translator bugs hide.

Grammar restriction: only constructs whose semantics are identical in
Trino/Spark/DuckDB (integer arithmetic without division, string ops with
positive indices, three-valued logic); known cross-engine divergences
(integer '/', round() on binary doubles, negative substr) are excluded by
construction, so any mismatch is an ENGINE bug, not an oracle artifact.

Usage: python scripts/expr_fuzz.py [n_exprs] [seed]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH = 20  # expressions per SELECT (amortizes per-query engine cost)

_INT_ATOMS = ["n_nationkey", "n_regionkey", "3", "7", "0", "CAST(NULL AS BIGINT)"]
_STR_ATOMS = ["n_name", "'abc'", "'_X'", "''", "CAST(NULL AS VARCHAR)"]


def gen(rng: random.Random, typ: str, depth: int) -> str:
    """One random expression of SQL type `typ` ('int' | 'str' | 'bool')."""
    if depth <= 0:
        if typ == "int":
            return rng.choice(_INT_ATOMS)
        if typ == "str":
            return rng.choice(_STR_ATOMS)
        return rng.choice(
            [f"{rng.choice(_INT_ATOMS)} > {rng.randint(0, 20)}", "TRUE", "FALSE"]
        )
    d = depth - 1
    i = lambda: gen(rng, "int", d)  # noqa: E731
    s = lambda: gen(rng, "str", d)  # noqa: E731
    b = lambda: gen(rng, "bool", d)  # noqa: E731
    if typ == "int":
        return rng.choice(
            [
                lambda: f"abs({i()})",
                lambda: f"greatest(coalesce({i()}, 0), coalesce({i()}, 0))",
                lambda: f"least(coalesce({i()}, 0), coalesce({i()}, 0))",
                lambda: f"({i()} + {i()})",
                lambda: f"({i()} - {i()})",
                lambda: f"({i()} * {rng.randint(0, 5)})",
                lambda: f"mod({i()}, {rng.randint(1, 9)})",
                lambda: f"length({s()})",
                lambda: f"strpos({s()}, '{rng.choice('AEIRST_')}')",
                lambda: f"CASE WHEN {b()} THEN {i()} ELSE {i()} END",
                lambda: f"coalesce({i()}, {i()})",
                lambda: f"nullif({i()}, {i()})",
            ]
        )()
    if typ == "str":
        return rng.choice(
            [
                lambda: f"lower({s()})",
                lambda: f"upper({s()})",
                lambda: f"substr({s()}, {rng.randint(1, 4)}, {rng.randint(1, 5)})",
                lambda: f"({s()} || {s()})",
                lambda: f"trim({s()})",
                lambda: f"replace({s()}, 'a', '_')",
                lambda: f"coalesce({s()}, {s()})",
                lambda: f"CASE WHEN {b()} THEN {s()} ELSE {s()} END",
                lambda: f"reverse({s()})",
                # DuckDB's split_part(NULL, ...) returns '' where Trino (and
                # the engine) propagate NULL — a DuckDB divergence, not an
                # engine bug; keep the argument non-null so the oracle holds.
                lambda: f"split_part(coalesce({s()}, 'nil'), '{rng.choice('AE_')}', {rng.randint(1, 4)})",
                lambda: f"substr({s()}, {rng.randint(1, 5)})",
                lambda: f"concat_ws('-', {s()}, {s()})",
                lambda: f"lpad({s()}, {rng.randint(1, 14)}, '.')",
                lambda: f"rpad({s()}, {rng.randint(1, 14)}, '.')",
                lambda: f"translate({s()}, 'AEI', 'aei')",
                lambda: f"greatest(coalesce({s()}, 'z'), coalesce({s()}, 'z'))",
                lambda: f"least(coalesce({s()}, 'z'), coalesce({s()}, 'z'))",
            ]
        )()
    return rng.choice(
        [
            lambda: f"({i()} > {i()})",
            lambda: f"({i()} = {i()})",
            lambda: f"({s()} = {s()})",
            lambda: f"({b()} AND {b()})",
            lambda: f"({b()} OR {b()})",
            lambda: f"(NOT {b()})",
            lambda: f"({i()} BETWEEN {rng.randint(0, 5)} AND {rng.randint(6, 30)})",
            lambda: f"({i()} IN ({rng.randint(0, 9)}, {rng.randint(10, 24)}))",
            lambda: f"({s()} LIKE 'a%')",
            lambda: f"({s()} IS NULL)",
        ]
    )()


def gen_agg(rng: random.Random, depth: int = 2) -> str:
    """Aggregate call over a generated int expression (GROUP BY fuzz)."""
    e = gen(rng, "int", depth)
    return rng.choice(
        [
            f"sum({e})",
            f"min({e})",
            f"max({e})",
            f"count({e})",
            f"count(DISTINCT {e})",
            f"sum(CASE WHEN {gen(rng, 'bool', depth)} THEN 1 ELSE 0 END)",
        ]
    )


def gen_window(rng: random.Random, depth: int = 2) -> str:
    """Window call with a deterministic frame (ordered by the unique key)."""
    e = gen(rng, "int", depth)
    frame = rng.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
        ]
    )
    over = f"OVER (PARTITION BY n_regionkey ORDER BY n_nationkey {frame})"
    plain = f"OVER (PARTITION BY n_regionkey ORDER BY n_nationkey)"
    return rng.choice(
        [
            f"sum({e}) {over}",
            f"min({e}) {over}",
            f"max({e}) {over}",
            f"row_number() {plain}",
            f"rank() {plain}",
            f"lag({e}, 1) {plain}",
            f"lead({e}, 1) {plain}",
        ]
    )


def _values_equal(av, ov) -> bool:
    if av is None or (isinstance(av, float) and av != av):
        return ov is None or (isinstance(ov, float) and ov != ov)
    try:
        return av == ov or int(av) == int(ov)  # HUGEINT vs int64 etc.
    except (TypeError, ValueError, OverflowError):
        return av == ov


def fuzz(n_exprs: int = 200, seed: int = 42, sf_dir: str = "/root/testdata/sf0.01"):
    """Returns the list of mismatching expressions (empty = clean)."""
    import duckdb

    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark
    from trino_spark.testing import duckdb_connection

    rng = random.Random(seed)
    exprs = []
    for k in range(n_exprs):
        typ = ("int", "str", "bool")[k % 3]
        exprs.append(gen(rng, typ, rng.randint(1, 4)))

    spark = get_spark(app_name="expr_fuzz")
    eng = TrinoEngine(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    bad: list[str] = []
    for ofs in range(0, len(exprs), BATCH):
        chunk = exprs[ofs : ofs + BATCH]
        cols = ", ".join(f"{e} AS e{j}" for j, e in enumerate(chunk))
        sql = f"SELECT n_nationkey, {cols} FROM nation ORDER BY n_nationkey"
        try:
            got = eng.sql(sql).toPandas()
            want = con.execute(sql).fetch_df()
        except Exception:  # a whole-batch failure: bisect by expr
            n_before = len(bad)
            for e in chunk:
                single = f"SELECT n_nationkey, {e} AS e0 FROM nation ORDER BY n_nationkey"
                try:
                    g1 = eng.sql(single).toPandas()
                    w1 = con.execute(single).fetch_df()
                except Exception as sexc:
                    bad.append(f"ERROR {e}: {str(sexc).splitlines()[0][:120]}")
                    continue
                for av, ov in zip(g1["e0"].tolist(), w1["e0"].tolist()):
                    if not _values_equal(av, ov):
                        bad.append(f"MISMATCH {e}: spark={av!r} duckdb={ov!r}")
                        break
            if len(bad) == n_before:
                # every expression passed alone: the combination itself
                # failed — record it, never silently count the batch clean
                bad.append(f"BATCH-ONLY FAILURE at offset {ofs} (exprs pass alone)")
            continue
        for j, e in enumerate(chunk):
            a, o = got[f"e{j}"], want[f"e{j}"]
            for av, ov in zip(a.tolist(), o.tolist()):
                if not _values_equal(av, ov):
                    bad.append(f"MISMATCH {e}: spark={av!r} duckdb={ov!r}")
                    break
    return bad


def fuzz_agg(n_exprs: int = 60, seed: int = 42, sf_dir: str = "/root/testdata/sf0.01",
             window: bool = False):
    """GROUP BY aggregate (or window) differential fuzz. Returns mismatches."""
    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark
    from trino_spark.testing import duckdb_connection

    rng = random.Random(seed)
    gen_one = gen_window if window else gen_agg
    exprs = [gen_one(rng, rng.randint(1, 3)) for _ in range(n_exprs)]
    spark = get_spark(app_name="expr_fuzz")
    eng = TrinoEngine(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    bad: list[str] = []
    for ofs in range(0, len(exprs), BATCH):
        chunk = exprs[ofs : ofs + BATCH]
        cols = ", ".join(f"{e} AS e{j}" for j, e in enumerate(chunk))
        if window:
            sql = f"SELECT n_nationkey, {cols} FROM nation ORDER BY n_nationkey"
        else:
            sql = (
                f"SELECT n_regionkey, {cols} FROM nation "
                "GROUP BY n_regionkey ORDER BY n_regionkey"
            )
        try:
            got = eng.sql(sql).toPandas()
            want = con.execute(sql).fetch_df()
        except Exception as exc:
            bad.append(f"ERROR batch@{ofs}: {str(exc).splitlines()[0][:160]}")
            continue
        for j, e in enumerate(chunk):
            for av, ov in zip(got[f"e{j}"].tolist(), want[f"e{j}"].tolist()):
                if not _values_equal(av, ov):
                    bad.append(f"MISMATCH {e}: spark={av!r} duckdb={ov!r}")
                    break
    return bad





# ------------------------------------------------------- datetime patterns
# (trino date_format MySQL-token, duckdb strftime token) pairs whose output
# is engine-independent; the generator composes random format strings.
_DT_TOKENS = [
    ("%Y", "%Y"), ("%y", "%y"), ("%m", "%m"), ("%d", "%d"),
    ("%H", "%H"), ("%h", "%I"), ("%i", "%M"), ("%s", "%S"),
    ("%j", "%j"), ("%p", "%p"), ("%a", "%a"), ("%W", "%A"), ("%M", "%B"),
]
# (format_datetime Joda token, duckdb strftime token)
_JODA_TOKENS = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
]
_SEPS = ["-", "/", " ", ":", "."]


def fuzz_datetime(n_formats: int = 40, seed: int = 42,
                  sf_dir: str = "/root/testdata/sf0.01"):
    """date_format (MySQL tokens) and format_datetime (Joda tokens) through
    the dialect's pattern translator vs DuckDB strftime on paired formats.
    Returns mismatches."""
    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark
    from trino_spark.testing import duckdb_connection

    rng = random.Random(seed)
    spark = get_spark(app_name="expr_fuzz")
    eng = TrinoEngine(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    bad: list[str] = []
    for i in range(n_formats):
        joda = rng.random() < 0.4
        table = _JODA_TOKENS if joda else _DT_TOKENS
        pairs = [rng.choice(table) for _ in range(rng.randint(2, 5))]
        sep = rng.choice(_SEPS)
        t_fmt = sep.join(p[0] for p in pairs)
        d_fmt = sep.join(p[1] for p in pairs)
        fn = "format_datetime" if joda else "date_format"
        esql = (
            f"SELECT o_orderkey, {fn}(CAST(o_orderdate AS TIMESTAMP), '{t_fmt}') AS e "
            "FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"
        )
        dsql = (
            f"SELECT o_orderkey, strftime(CAST(o_orderdate AS TIMESTAMP), '{d_fmt}') AS e "
            "FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"
        )
        try:
            got = [r.e for r in eng.sql(esql).collect()]
            want = [r[1] for r in con.execute(dsql).fetchall()]
        except Exception as exc:
            bad.append(f"fmt{i} {fn}('{t_fmt}') ERROR: {str(exc).splitlines()[0][:140]}")
            continue
        for a, o in zip(got, want):
            if a != o:
                bad.append(
                    f"fmt{i} {fn}('{t_fmt}' vs '{d_fmt}') DIVERGED: "
                    f"engine={a!r} duckdb={o!r}"
                )
                break
    return bad


# ------------------------------------------------------------- SQL/JSON
def _gen_json(rng: random.Random, depth: int):
    """Random JSON value; returns (python value, list of paths to leaves)."""
    kind = rng.choice(["obj", "arr", "leaf"] if depth > 0 else ["leaf"])
    if kind == "leaf":
        v = rng.choice([rng.randint(0, 99), f"s{rng.randint(0, 9)}", True, False, 2.5, 0.25])
        return v, [""]
    if kind == "arr":
        items, paths = [], []
        for idx in range(rng.randint(1, 3)):
            v, sub = _gen_json(rng, depth - 1)
            items.append(v)
            paths += [f"[{idx}]{p}" for p in sub]
        return items, paths
    obj, paths = {}, []
    for k in range(rng.randint(1, 3)):
        key = f"k{k}"
        v, sub = _gen_json(rng, depth - 1)
        obj[key] = v
        paths += [f".{key}{p}" for p in sub]
    return obj, paths


def fuzz_json(n_docs: int = 30, seed: int = 42, sf_dir: str = "/root/testdata/sf0.01"):
    """json_value over random nested documents and leaf paths (plus missing
    paths) vs DuckDB's ->> on the same doc/path. Returns mismatches."""
    import json as _json

    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark
    from trino_spark.testing import duckdb_connection

    rng = random.Random(seed)
    spark = get_spark(app_name="expr_fuzz")
    eng = TrinoEngine(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    bad: list[str] = []
    for i in range(n_docs):
        doc, paths = _gen_json(rng, 3)
        if not isinstance(doc, (dict, list)):
            continue
        txt = _json.dumps(doc)
        probe = [p for p in paths if p] + [".nope", ".k0.nope"]
        for p in rng.sample(probe, min(4, len(probe))):
            try:
                a = eng.sql(
                    f"SELECT json_value('{txt}', 'lax ${p}') AS v"
                ).collect()[0].v
                o = con.execute(f"SELECT '{txt}'->>'${p}' AS v").fetchone()[0]
            except Exception as exc:
                bad.append(f"doc{i} path ${p} ERROR: {str(exc).splitlines()[0][:140]}")
                continue
            if a != o:
                bad.append(
                    f"doc{i} path ${p} DIVERGED: engine={a!r} duckdb={o!r} doc={txt[:120]}"
                )
    return bad


# --------------------------------------------------------------- arrays
def _gen_array_pair(rng: random.Random, depth: int) -> tuple[str, str]:
    """(trino_expr, duck_expr) both evaluating to the same integer array."""
    if depth <= 0:
        vals = [str(rng.randint(0, 9)) for _ in range(rng.randint(1, 6))]
        return f"ARRAY[{', '.join(vals)}]", f"[{', '.join(vals)}]"
    t, d = _gen_array_pair(rng, depth - 1)
    op = rng.choice(["sort", "distinct", "slice", "concat", "identity"])
    if op == "sort":
        return f"array_sort({t})", f"list_sort({d})"
    if op == "distinct":
        # DuckDB's list_distinct does not preserve order — sort both sides
        return f"array_sort(array_distinct({t}))", f"list_sort(list_distinct({d}))"
    if op == "slice":
        a, b = rng.randint(1, 3), rng.randint(1, 3)
        return f"slice({t}, {a}, {b})", f"({d})[{a}:{a + b - 1}]"
    if op == "concat":
        t2, d2 = _gen_array_pair(rng, 0)
        return f"concat({t}, {t2})", f"list_concat({d}, {d2})"
    return t, d


def _gen_array_scalar(rng: random.Random) -> tuple[str, str]:
    """(trino_expr, duck_expr) scalar over a generated array pair."""
    t, d = _gen_array_pair(rng, rng.randint(0, 2))
    k = rng.choice(["at", "card", "max", "min", "pos", "sum", "join", "contains"])
    if k == "at":
        i = rng.randint(1, 2)
        return (
            f"element_at(concat({t}, ARRAY[0, 0]), {i})",
            f"list_extract(list_concat({d}, [0, 0]), {i})",
        )
    if k == "card":
        return f"cardinality({t})", f"len({d})"
    if k == "max":
        return f"array_max({t})", f"list_max({d})"
    if k == "min":
        return f"array_min({t})", f"list_min({d})"
    if k == "pos":
        v = rng.randint(0, 9)
        return f"array_position({t}, {v})", f"coalesce(list_position({d}, {v}), 0)"
    if k == "sum":
        return f"reduce({t}, 0, (s, x) -> s + x, s -> s)", f"list_sum({d})"
    if k == "contains":
        v = rng.randint(0, 9)
        return (
            f"CASE WHEN contains({t}, {v}) THEN 1 ELSE 0 END",
            f"CASE WHEN list_contains({d}, {v}) THEN 1 ELSE 0 END",
        )
    # DuckDB's array_to_string([]) yields NULL where Trino's array_join
    # (and the engine) return '' — normalize the duck side
    return f"array_join({t}, ',')", f"coalesce(array_to_string({d}, ','), '')"


def fuzz_arrays(n_exprs: int = 60, seed: int = 42, sf_dir: str = "/root/testdata/sf0.01"):
    """Array-function compositions with paired Trino/DuckDB rendering."""
    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark
    from trino_spark.testing import duckdb_connection

    rng = random.Random(seed)
    spark = get_spark(app_name="expr_fuzz")
    eng = TrinoEngine(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    bad: list[str] = []
    for i in range(n_exprs):
        t, d = _gen_array_scalar(rng)
        try:
            a = eng.sql(f"SELECT {t} AS v").collect()[0].v
            o = con.execute(f"SELECT {d} AS v").fetchone()[0]
        except Exception as exc:
            bad.append(f"arr{i} ERROR {t}: {str(exc).splitlines()[0][:140]}")
            continue
        ok = (a is None and o is None) or str(a) == str(o)
        if not ok:
            bad.append(f"arr{i} DIVERGED: trino[{t}]={a!r} duck[{d}]={o!r}")
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    bad = fuzz(n, seed)
    bad += fuzz_agg(max(20, n // 3), seed)
    bad += fuzz_agg(max(20, n // 3), seed + 1, window=True)
    bad += fuzz_datetime(max(20, n // 5), seed + 2)
    bad += fuzz_json(max(15, n // 10), seed + 3)
    bad += fuzz_arrays(max(20, n // 6), seed + 4)
    for line in bad:
        print(line)
    print(
        f"\n{n} scalar + agg/window/datetime/json/array families, "
        f"{len(bad)} mismatches (seed {seed})"
    )
    sys.exit(1 if bad else 0)
