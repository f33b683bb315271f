#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline query corpus at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors BASELINE.md (Benchto: prewarm then measured runs; we use
1 prewarm + 2 measured, min taken) compressed to fit the per-round budget.
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
MEASURED_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# Headline set: the adapted TPC-H corpus + the heaviest extension operators.
HEADLINE_PREFIXES = ("q",)


def _run_once(spec, spark) -> float:
    t0 = time.perf_counter()
    df = spec.build(spark, SF_DIR)
    # Force full execution without driver-side materialization cost:
    # count() of a cached-nothing plan executes every operator.
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="trino_spark_bench")
    specs = {n: s for n, s in sorted(all_specs().items())}
    timings: dict[str, float] = {}
    for name, spec in specs.items():
        try:
            _run_once(spec, spark)  # prewarm (JIT + parquet footer cache)
            timings[name] = min(_run_once(spec, spark) for _ in range(MEASURED_RUNS))
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = None
    total = sum(v for v in timings.values() if v is not None)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "corpus_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: (round(v, 4) if v is not None else None) for k, v in timings.items()},
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
