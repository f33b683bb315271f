"""SQL-routine interpreter fuzz regression (scripts/routine_fuzz.py):
random DECLARE/SET/IF/WHILE programs rendered both as CREATE FUNCTION
bodies and as direct Python evaluation of the same AST."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def test_program_generator_terminates_and_matches_shape():
    import random

    from routine_fuzz import gen_program

    rng = random.Random(0)
    for _ in range(20):
        body, py = gen_program(rng)
        assert "RETURN" in body
        # python reference halts and yields ints for all probe inputs
        for p in (0, 1, 3, 7):
            assert isinstance(py(p), int)


def test_routine_interpreter_differential(spark, sf_dir):
    from routine_fuzz import fuzz_routines

    assert fuzz_routines(n_programs=8, seed=42) == []
