#!/usr/bin/env python
"""One-more-decade scaling probe: build an sf1 dataset (10x sf0.1) under
the repo and re-time the PERF.md ratio queries at sf0.1 vs sf1.

The floor-bound claim ("data-dependent share grows sublinearly") rests on
sf0.01 -> sf0.1 ratios of 0.8-1.6x; this adds the sf0.1 -> sf1 decade.

TPC-H tables come from the deterministic generator
(trino_spark/sources/tpchgen.py) at sf=1. Corpus tables (documents /
embeddings / events) are 10x replications of the driver's immutable
sf0.1 parquet with key offsets and light text perturbation — a scaling
corpus for PERFORMANCE ratios only (correctness stays gated on the
driver's own testdata; TESTDATA.md inputs are never modified).

Usage: python scripts/scale_probe.py [--rebuild]
       python scripts/scale_probe.py --tpch-duel
Writes parquet to <repo>/bench_sf1/ (gitignored) and prints a markdown
ratio table for PERF.md.

--tpch-duel runs ALL 22 TPC-H queries at sf1 on BOTH engines with the
same protocol (warm + min-of-3, 32 threads): Spark via the registry
builders (noop sink), DuckDB via the same oracle SQL on the identical
parquet. This measures whether the fixed per-query Spark job floor
(~0.3-0.5 s, which dominates sf0.1 totals) amortizes once per-query
data work exceeds it — the floor-bound claim behind the 100 TB design
point.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
SF1 = str(REPO / "bench_sf1")

QUERIES = [
    "dedup_exact",
    "corpus_shuffle_buckets",
    "corpus_shard_balanced",
    "text_boilerplate_ngrams",
    "q01_pricing_summary",
    "q03_shipping_priority",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    from trino_spark.catalog import TPCH_TABLES
    from trino_spark.sources.tpchgen import gen_table

    out = Path(SF1)
    out.mkdir(exist_ok=True)
    for t in TPCH_TABLES:
        gen_table(spark, t, sf=1.0).write.mode("overwrite").parquet(f"{SF1}/{t}.parquet")
        print(f"  generated {t} (sf1)", file=sys.stderr)
    # 10x replication with disjoint keys; perturb text so exact-dedup and
    # n-gram work doesn't collapse to 10 identical copies.
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/documents.parquet")
    )
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_emb = emb.count()
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(n_emb)).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(f"{SF1}/embeddings.parquet")
    )
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    n_ev = ev.count()
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(n_ev)).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/events.parquet")
    )
    print("  replicated documents/embeddings/events (10x)", file=sys.stderr)


def _time(spec, spark, sf_dir: str, runs: int = 3) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # prewarm
    return min(once() for _ in range(runs))


def _time_duck(con, sql: str, runs: int = 3) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        con.execute(sql).fetch_arrow_table()
        return time.perf_counter() - t0

    once()  # prewarm
    return min(once() for _ in range(runs))


def tpch_duel(spark) -> None:
    """All 22 TPC-H queries, Spark vs DuckDB on identical sf1 parquet,
    warm min-of-3 each. The `floor` column is the same Spark query timed
    at sf0.001 (data work ~ 0): it measures the fixed per-query job cost
    (planning + task launch + py4j) that a long-running cluster
    amortizes but a single-process benchmark pays 22 times. `corrected`
    = (sf1 - floor) / duckdb, the data-work ratio relevant at the
    100 TB design point."""
    from trino_spark.queries import tpch
    from trino_spark.testing import duckdb_connection

    specs = tpch.REG.specs()
    con = duckdb_connection(SF1)
    con.execute("SET threads TO 32")
    rows = []
    for name, spec in specs.items():
        s = _time(spec, spark, SF1)
        f = _time(spec, spark, "/root/testdata/sf0.001")
        d = _time_duck(con, spec.oracle)
        corr = max(s - f, 0.0) / d
        rows.append((name, s, f, d, s / d, corr))
        print(
            f"| {name} | {s:.2f} | {f:.2f} | {d:.2f} | {s / d:.1f}x | {corr:.1f}x |",
            flush=True,
        )
    ts = sum(r[1] for r in rows)
    tf = sum(r[2] for r in rows)
    td = sum(r[3] for r in rows)
    print(
        f"| **total** | **{ts:.2f}** | **{tf:.2f}** | **{td:.2f}** |"
        f" **{ts / td:.1f}x** | **{max(ts - tf, 0.0) / td:.1f}x** |"
    )
    worst = sorted(rows, key=lambda r: -r[5])[:5]
    print("worst corrected:", [(n, round(c, 1)) for n, *_, c in worst], file=sys.stderr)


def main() -> None:
    from trino_spark.queries import all_specs
    from trino_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    if "--rebuild" in sys.argv or not Path(SF1, "lineitem.parquet").exists():
        print("building sf1 dataset...", file=sys.stderr)
        build_sf1(spark)
    if "--tpch-duel" in sys.argv:
        print("| query | spark sf1 | floor (sf0.001) | duckdb sf1 | raw | corrected |")
        print("|---|---|---|---|---|---|")
        tpch_duel(spark)
        return
    specs = all_specs()
    print("| query | sf0.1 | sf1 | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a = _time(specs[name], spark, SF01)
        b = _time(specs[name], spark, SF1)
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")


if __name__ == "__main__":
    main()
