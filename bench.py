#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the full query corpus at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "corpus_wall_clock", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...}

Protocol mirrors BASELINE.md (Benchto: prewarm then measured runs): a
global JIT warmup, then per query 1 prewarm + N measured (min taken).

The stdout line is kept under ~2.5 KB so the driver's line capture never
truncates it (r1's BENCH json came back "parsed": null from an over-long
line): `queries` carries every TPC-H q* entry plus the slowest
SLOW_REPORT non-TPC-H entries; the COMPLETE per-query map is written to
BENCH_FULL.json next to this script for round-over-round regression
tracking.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from trino_spark.queries import all_specs
from trino_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# min-of-3 measured runs per query (after a prewarm): single-run numbers
# in a shared 288-query JVM read as phantom regressions — r4's two largest
# "regressions" were unchanged-code Python-heavy queries under a bigger
# corpus. Minima make round-over-round diffs quiet.
MEASURED_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
SLOW_REPORT = 15  # non-TPC-H entries on the stdout line


def _run_once(spec, spark) -> float:
    t0 = time.perf_counter()
    df = spec.build(spark, SF_DIR)
    # Force full execution without driver-side materialization cost:
    # noop write executes every operator.
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="trino_spark_bench")
    specs = {n: s for n, s in sorted(all_specs().items())}
    # Global warmup: run one scan-heavy query a few times so JVM JIT +
    # parquet footer caches don't land in the first measured query
    # (r1: q01 reported 3.2 s cold vs ~1 s converged).
    warm = specs.get("q01_pricing_summary") or next(iter(specs.values()))
    for _ in range(3):
        try:
            _run_once(warm, spark)
        except Exception:
            break
    timings: dict[str, float | None] = {}
    for name, spec in specs.items():
        try:
            _run_once(spec, spark)  # per-query prewarm
            timings[name] = min(_run_once(spec, spark) for _ in range(MEASURED_RUNS))
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = None
    total = sum(v for v in timings.values() if v is not None)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    full = {k: (round(v, 4) if v is not None else None) for k, v in timings.items()}
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_FULL.json").write_text(
            json.dumps({"sf": sf, "total": round(total, 3), "queries": full}, indent=1)
        )
    except OSError:
        pass

    tpch = {k: v for k, v in full.items() if k[0] == "q" and k[1].isdigit()}
    rest = {k: v for k, v in full.items() if k not in tpch}
    failed = {k: None for k, v in rest.items() if v is None}
    slow = dict(
        sorted(((k, v) for k, v in rest.items() if v is not None), key=lambda x: -x[1])[
            :SLOW_REPORT
        ]
    )
    line = {
        "metric": "corpus_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(full),
        "n_failed": len([v for v in full.values() if v is None]),
        "tpch_total": round(sum(v for v in tpch.values() if v is not None), 3),
        "queries": {**tpch, **slow, **failed},
        "sf": sf,
    }
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
