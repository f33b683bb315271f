"""Driver-mimic: run every registry query at sf0.01 with its DuckDB oracle,
time both sides, and report failures + per-query cost in registry order.

Usage: python scripts/driver_mimic.py [sf_dir] [--limit N] [--tolerant]
       [--only name1,name2]

STRICT by default: each (name-sorted) output column must have the same
pandas dtype KIND on both sides (int vs float vs bool vs object). The
driver's canonicalizer hashes values, so Spark BIGINT 19 vs DuckDB DOUBLE
19.0 is a hash FAIL even when the tolerant value compare passes — exactly
the `func_math_ops` r1/r2 failure mode. --tolerant drops the dtype check
(debugging only; a tolerant-green query can still hash-fail the driver).

Writes a JSON report to /tmp/driver_mimic.json.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trino_spark.queries import all_specs  # noqa: E402
from trino_spark.session import get_spark  # noqa: E402
from trino_spark.testing import _cells_equal, _frame_to_rows, duckdb_connection  # noqa: E402


def _dtype_kind(series) -> str:
    """Collapse a pandas dtype to the kind the driver's value-hash is
    sensitive to: b(ool) / i(nt) / f(loat) / M (datetime) / O (everything
    else — strings, arrays, decimals as objects)."""
    k = series.dtype.kind
    if k == "u":
        return "i"
    if k in ("m", "M"):
        return "M"
    if k in ("b", "i", "f"):
        return k
    # object columns: sniff the first non-null value so a float-valued
    # object column (DuckDB sometimes) still compares as 'f'.
    for v in series:
        if v is None:
            continue
        if isinstance(v, bool):
            return "b"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            return "f"
        break
    return "O"


def _compare(pdf, opdf, name, strict=False):
    a_cols, o_cols = sorted(pdf.columns), sorted(opdf.columns)
    assert a_cols == o_cols, f"{name}: column mismatch spark={a_cols} oracle={o_cols}"
    if strict:
        # The driver's canonicalizer sorts cell values with pandas — a
        # list/dict/ndarray cell raises `unhashable type` there (the
        # func_array_hof r3 red). Reject them here so mimic-green always
        # implies gate-canonicalizable.
        import numpy as _np

        for frame, side in ((pdf, "spark"), (opdf, "oracle")):
            for c in a_cols:
                for v in frame[c]:
                    if v is None:
                        continue
                    assert not isinstance(v, (list, dict, set, _np.ndarray)), (
                        f"{name}: column {c!r} ({side}) holds non-scalar cells "
                        f"({type(v).__name__}) — the driver canonicalizer cannot "
                        f"sort these; serialize with array_join/array_to_string"
                    )
                    break  # first non-null is enough
    if strict:
        for c in a_cols:
            ka, ko = _dtype_kind(pdf[c]), _dtype_kind(opdf[c])
            assert ka == ko, (
                f"{name}: STRICT dtype-kind mismatch on column {c!r}: "
                f"spark={pdf[c].dtype}({ka}) oracle={opdf[c].dtype}({ko}) — "
                f"the driver hash WILL fail on this (e.g. 19 vs 19.0)"
            )
    actual, expect = _frame_to_rows(pdf), _frame_to_rows(opdf)
    assert len(actual) == len(expect), f"{name}: rows spark={len(actual)} oracle={len(expect)}"
    for i, (ra, re_) in enumerate(zip(actual, expect)):
        ok = len(ra) == len(re_) and all(_cells_equal(x, y) for x, y in zip(ra, re_))
        assert ok, f"{name}: row {i} differs\n  spark : {ra}\n  oracle: {re_}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    strict = "--tolerant" not in sys.argv

    spark = get_spark()
    con = duckdb_connection(sf_dir)
    specs = all_specs()
    report: dict[str, dict] = {}
    t_all = time.time()
    if only is not None:
        missing = only - set(specs)
        assert not missing, f"--only names not in registry: {sorted(missing)}"
        specs = {n: s for n, s in specs.items() if n in only}
    for i, (name, spec) in enumerate(specs.items()):
        if limit is not None and i >= limit:
            break
        entry: dict = {}
        t0 = time.time()
        try:
            df = spec.build(spark, sf_dir)
            pdf = df.toPandas()
            entry["spark_s"] = round(time.time() - t0, 3)
            entry["rows"] = len(pdf)
            if spec.oracle is not None:
                t1 = time.time()
                opdf = con.execute(spec.oracle).fetch_df()
                entry["oracle_s"] = round(time.time() - t1, 3)
                _compare(pdf, opdf, name, strict=strict)
                entry["ok"] = True
            else:
                entry["ok"] = "rows-only"
        except Exception as exc:  # noqa: BLE001
            entry["spark_s"] = round(time.time() - t0, 3)
            entry["ok"] = False
            entry["err"] = f"{type(exc).__name__}: {str(exc)[:300]}"
            entry["tb"] = traceback.format_exc()[-1200:]
        report[name] = entry
        status = entry["ok"]
        print(f"[{i + 1}/{len(specs)}] {name}: ok={status} spark={entry.get('spark_s')}s", flush=True)
    total = round(time.time() - t_all, 1)
    bad = {n: e for n, e in report.items() if e.get("ok") is False}
    slow = sorted(
        ((n, e.get("spark_s", 0)) for n, e in report.items()), key=lambda t: -t[1]
    )[:15]
    print(f"\nTOTAL {total}s  fail={len(bad)}")
    for n, e in bad.items():
        print(f"FAIL {n}: {e['err']}")
    print("SLOWEST:", slow)
    Path("/tmp/driver_mimic.json").write_text(json.dumps({"total_s": total, "report": report}, indent=1, default=str))


if __name__ == "__main__":
    main()
