"""DML differential fuzz regression (scripts/dml_fuzz.py): random
INSERT/UPDATE/DELETE sequences on a managed table vs DuckDB executing the
same statements, full-state compared after every op. The fixed-seed sample
pins the copy-on-write machinery; the standalone script runs wider sweeps.
(Seed 42 originally exposed positional INSERT mapping against the
partition-last physical layout instead of the declared column order.)"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def test_dml_differential_partitioned(spark, sf_dir):
    from dml_fuzz import fuzz_dml

    assert fuzz_dml(n_ops=12, seed=42, sf_dir=sf_dir, partitioned=True) == []


def test_dml_differential_flat(spark, sf_dir):
    from dml_fuzz import fuzz_dml

    assert fuzz_dml(n_ops=12, seed=43, sf_dir=sf_dir, partitioned=False) == []


def test_positional_insert_respects_declared_order(spark, sf_dir):
    """Partitioned managed table: SELECT * and positional INSERT use the
    DECLARED column order, not the partition-last physical layout."""
    import os

    from trino_spark.dialect.engine import TrinoEngine

    eng = TrinoEngine(spark, sf_dir)
    name = f"ins_order_{os.getpid()}"
    eng.sql(f"DROP TABLE IF EXISTS {name}")
    eng.sql(
        f"CREATE TABLE {name} WITH (partitioned_by = ARRAY['cat']) AS "
        "SELECT * FROM (VALUES (1, 'a', 10)) AS t(k, cat, v)"
    )
    try:
        assert eng.sql(f"SELECT * FROM {name}").columns == ["k", "cat", "v"]
        eng.sql(f"INSERT INTO {name} VALUES (2, 'b', 20)")
        rows = {tuple(r) for r in eng.sql(f"SELECT k, cat, v FROM {name}").collect()}
        assert rows == {(1, "a", 10), (2, "b", 20)}
    finally:
        eng.sql(f"DROP TABLE IF EXISTS {name}")
