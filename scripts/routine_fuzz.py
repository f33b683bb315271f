"""SQL-routine interpreter fuzzer: random control-flow programs
(DECLARE/SET/IF/ELSEIF/ELSE/WHILE) generated as an AST, rendered BOTH as
a `CREATE FUNCTION ... BEGIN ... END` body for the engine's routine
interpreter (dialect/routine_body.py) AND as a direct Python evaluation
of the same AST — results compared over several argument values.

Termination by construction: every WHILE uses a dedicated counter with a
mandatory increment appended to its body, so all programs halt.

Usage: python scripts/routine_fuzz.py [n_programs] [seed]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_OPS = {"+": lambda a, b: a + b, "-": lambda a, b: a - b, "*": lambda a, b: a * b}
_CMP = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
}


def gen_expr(rng: random.Random, vars_: list[str], depth: int = 2):
    if depth <= 0 or rng.random() < 0.4:
        if vars_ and rng.random() < 0.6:
            return ("var", rng.choice(vars_))
        return ("lit", rng.randint(0, 9))
    op = rng.choice(list(_OPS))
    if op == "*":  # keep magnitudes bounded
        return ("bin", "*", gen_expr(rng, vars_, 0), ("lit", rng.randint(0, 3)))
    return ("bin", op, gen_expr(rng, vars_, depth - 1), gen_expr(rng, vars_, depth - 1))


def gen_cond(rng: random.Random, vars_: list[str]):
    return ("cmp", rng.choice(list(_CMP)), gen_expr(rng, vars_, 1), gen_expr(rng, vars_, 1))


def gen_block(
    rng: random.Random,
    vars_: list[str],
    depth: int,
    counters: list[int],
    assignable: list[str],
) -> list:
    """Loop counters are READABLE (appear in expressions) but never the
    target of a random SET — otherwise a body could reset its own counter
    and loop forever (found by the engine's iteration-budget guard)."""
    out = []
    for _ in range(rng.randint(1, 3)):
        if depth <= 0:
            kind = "set"
        else:
            kind = rng.choice(["set", "set", "if", "while"])
        if kind == "set":
            out.append(("set", rng.choice(assignable), gen_expr(rng, vars_)))
        elif kind == "if":
            branches = [
                (gen_cond(rng, vars_), gen_block(rng, vars_, depth - 1, counters, assignable))
            ]
            if rng.random() < 0.5:
                branches.append(
                    (gen_cond(rng, vars_), gen_block(rng, vars_, depth - 1, counters, assignable))
                )
            els = (
                gen_block(rng, vars_, depth - 1, counters, assignable)
                if rng.random() < 0.6
                else []
            )
            out.append(("if", branches, els))
        else:
            counters[0] += 1
            c = f"c{counters[0]}"
            vars_.append(c)
            body = gen_block(rng, vars_, depth - 1, counters, assignable)
            loop_kind = rng.choice(["while", "repeat"])
            out.append((loop_kind, c, rng.randint(1, 6), body))
    return out


# ----------------------------------------------------------- render: SQL
def expr_sql(e) -> str:
    k = e[0]
    if k == "lit":
        return str(e[1])
    if k == "var":
        return e[1]
    if k == "bin":
        return f"({expr_sql(e[2])} {e[1]} {expr_sql(e[3])})"
    return f"({expr_sql(e[2])} {e[1]} {expr_sql(e[3])})"  # cmp


def block_sql(block: list) -> str:
    parts = []
    for st in block:
        if st[0] == "set":
            parts.append(f"SET {st[1]} = {expr_sql(st[2])};")
        elif st[0] == "if":
            branches, els = st[1], st[2]
            txt = f"IF {expr_sql(branches[0][0])} THEN {block_sql(branches[0][1])}"
            for c, b in branches[1:]:
                txt += f" ELSEIF {expr_sql(c)} THEN {block_sql(b)}"
            if els:
                txt += f" ELSE {block_sql(els)}"
            txt += " END IF;"
            parts.append(txt)
        elif st[0] == "while":
            _, c, lim, body = st
            parts.append(
                f"WHILE {c} < {lim} DO {block_sql(body)} SET {c} = {c} + 1; END WHILE;"
            )
        else:  # repeat: body runs at least once, UNTIL exits when true
            _, c, lim, body = st
            parts.append(
                f"REPEAT {block_sql(body)} SET {c} = {c} + 1; UNTIL {c} >= {lim} END REPEAT;"
            )
    return " ".join(parts)


# -------------------------------------------------------- render: python
def expr_py(e, env: dict) -> int:
    k = e[0]
    if k == "lit":
        return e[1]
    if k == "var":
        return env[e[1]]
    if k == "bin":
        return _OPS[e[1]](expr_py(e[2], env), expr_py(e[3], env))
    return _CMP[e[1]](expr_py(e[2], env), expr_py(e[3], env))


def block_py(block: list, env: dict) -> None:
    for st in block:
        if st[0] == "set":
            env[st[1]] = expr_py(st[2], env)
        elif st[0] == "if":
            branches, els = st[1], st[2]
            for c, b in branches:
                if expr_py(c, env):
                    block_py(b, env)
                    break
            else:
                if els:
                    block_py(els, env)
        elif st[0] == "while":
            _, c, lim, body = st
            while env[c] < lim:
                block_py(body, env)
                env[c] = env[c] + 1
        else:  # repeat: post-condition loop, body runs at least once
            _, c, lim, body = st
            while True:
                block_py(body, env)
                env[c] = env[c] + 1
                if env[c] >= lim:
                    break


def gen_program(rng: random.Random):
    """Returns (sql_body, py_eval(p) -> int, var names)."""
    vars_ = ["p", "a", "b"]
    counters = [0]
    a0 = gen_expr(rng, ["p"], 1)
    b0 = gen_expr(rng, ["p", "a"], 1)
    block = gen_block(rng, vars_, 2, counters, assignable=["p", "a", "b"])
    ret = gen_expr(rng, vars_)
    decls = "".join(
        f"DECLARE {c} BIGINT DEFAULT 0; " for c in vars_ if c.startswith("c")
    )
    sql_body = (
        f"DECLARE a BIGINT DEFAULT {expr_sql(a0)}; "
        f"DECLARE b BIGINT DEFAULT {expr_sql(b0)}; "
        + decls
        + block_sql(block)
        + f" RETURN {expr_sql(ret)};"
    )

    def py(p: int) -> int:
        env = {"p": p}
        env["a"] = expr_py(a0, env)
        env["b"] = expr_py(b0, env)
        for c in vars_:
            if c.startswith("c"):
                env[c] = 0
        block_py(block, env)
        return expr_py(ret, env)

    return sql_body, py


def fuzz_routines(n_programs: int = 20, seed: int = 42):
    """Returns mismatch descriptions (empty = clean)."""
    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark

    rng = random.Random(seed)
    spark = get_spark(app_name="routine_fuzz")
    eng = TrinoEngine(spark, "/root/testdata/sf0.001")
    bad: list[str] = []
    for i in range(n_programs):
        body, py = gen_program(rng)
        name = f"fz_routine_{seed}_{i}"
        ddl = f"CREATE FUNCTION {name}(p BIGINT) RETURNS BIGINT BEGIN {body} END"
        try:
            eng.sql(ddl)
        except Exception as exc:
            bad.append(f"prog{i} CREATE ERROR: {str(exc).splitlines()[0][:160]}\n  {body[:200]}")
            continue
        try:
            for p in (0, 1, 3, 7):
                got = eng.sql(f"SELECT {name}({p}) AS v").collect()[0].v
                want = py(p)
                if got != want:
                    bad.append(
                        f"prog{i} p={p} DIVERGED: engine={got} python={want}\n  {body[:300]}"
                    )
                    break
        except Exception as exc:
            bad.append(f"prog{i} EXEC ERROR: {str(exc).splitlines()[0][:160]}\n  {body[:200]}")
        finally:
            try:
                eng.sql(f"DROP FUNCTION IF EXISTS {name}")
            except Exception:
                pass
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    bad = fuzz_routines(n, seed)
    for line in bad:
        print(line)
    print(f"\n{n} programs, {len(bad)} mismatches (seed {seed})")
    sys.exit(1 if bad else 0)
