"""DML differential fuzzer: random INSERT/UPDATE/DELETE sequences run
through the engine's partition-scoped copy-on-write DML layer AND DuckDB
on the same statement text, with full-table state compared after every
operation.

The DML lifecycle queries pin fixed scenarios; this fuzzer walks random
paths through the same machinery — interleaved inserts into existing and
new partitions, predicate updates that touch zero/some/all partitions,
range deletes, column updates feeding later predicates — where
copy-on-write bookkeeping bugs (stale carry, missed partition, double
apply) would surface as a state divergence.

Usage: python scripts/dml_fuzz.py [n_ops] [seed]
"""

from __future__ import annotations

import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_CATS = ["'red'", "'green'", "'blue'", "'gold'"]


def gen_op(rng: random.Random, table: str, next_k: list[int]) -> str:
    """One random DML statement (shared Trino/DuckDB grammar)."""
    kind = rng.choice(["insert", "insert", "update_v", "update_cat", "delete"])
    if kind == "insert":
        rows = []
        for _ in range(rng.randint(1, 4)):
            k = next_k[0]
            next_k[0] += 1
            rows.append(f"({k}, {rng.choice(_CATS)}, {rng.randint(0, 99)})")
        return f"INSERT INTO {table} VALUES " + ", ".join(rows)
    if kind == "update_v":
        m, r = rng.choice([(2, 0), (2, 1), (3, 0), (3, 2), (5, 1)])
        return (
            f"UPDATE {table} SET v = v + {rng.randint(1, 9)} "
            f"WHERE k % {m} = {r}"
        )
    if kind == "update_cat":
        a, b = rng.sample(_CATS, 2)
        return f"UPDATE {table} SET cat = {a} WHERE cat = {b} AND v < {rng.randint(20, 90)}"
    lo = rng.randint(0, next_k[0])
    return f"DELETE FROM {table} WHERE k BETWEEN {lo} AND {lo + rng.randint(0, 6)}"


def fuzz_dml(
    n_ops: int = 25,
    seed: int = 42,
    sf_dir: str = "/root/testdata/sf0.001",
    partitioned: bool = True,
):
    """Returns list of divergence descriptions (empty = clean)."""
    import duckdb

    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.session import get_spark

    rng = random.Random(seed)
    table = f"fuzz_dml_{os.getpid()}_{seed}"
    spark = get_spark(app_name="dml_fuzz")
    eng = TrinoEngine(spark, sf_dir)
    con = duckdb.connect()

    seed_rows = ", ".join(
        f"({k}, {rng.choice(_CATS)}, {rng.randint(0, 99)})" for k in range(30)
    )
    seed_sel = f"SELECT * FROM (VALUES {seed_rows}) AS t(k, cat, v)"
    part = " WITH (partitioned_by = ARRAY['cat'])" if partitioned else ""
    eng.sql(f"DROP TABLE IF EXISTS {table}")
    eng.sql(f"CREATE TABLE {table}{part} AS {seed_sel}")
    con.execute(f"CREATE TABLE {table} AS {seed_sel}")
    next_k = [30]

    def state_engine():
        pdf = eng.sql(f"SELECT k, cat, v FROM {table}").toPandas()
        return sorted(map(tuple, pdf.itertuples(index=False)))

    def state_duck():
        return sorted(map(tuple, con.execute(f"SELECT k, cat, v FROM {table}").fetchall()))

    bad: list[str] = []
    for i in range(n_ops):
        op = gen_op(rng, table, next_k)
        try:
            eng.sql(op)
        except Exception as exc:
            bad.append(f"op{i} ENGINE ERROR {op}: {str(exc).splitlines()[0][:160]}")
            break
        con.execute(op)
        a, o = state_engine(), state_duck()
        if a != o:
            only_a = [r for r in a if r not in o][:3]
            only_o = [r for r in o if r not in a][:3]
            bad.append(
                f"op{i} DIVERGED after {op!r}: engine-only={only_a} duck-only={only_o} "
                f"(sizes {len(a)} vs {len(o)})"
            )
            break
    eng.sql(f"DROP TABLE IF EXISTS {table}")
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    all_bad = []
    for part in (True, False):
        b = fuzz_dml(n, seed, partitioned=part)
        all_bad += [f"[partitioned={part}] {x}" for x in b]
    for line in all_bad:
        print(line)
    print(f"\n2x{n} DML ops, {len(all_bad)} divergences (seed {seed})")
    sys.exit(1 if all_bad else 0)
