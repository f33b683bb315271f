"""Mergeable quantile-sketch columns — Trino's qdigest/tdigest workflow.

Reference: spi/type/QuantileDigestType.java + scalar
QuantileDigestFunctions.java:40 / TDigestFunctions.java:31 — Trino stores
quantile sketches as first-class column values, merges them with merge(),
and queries them with value_at_quantile(). Spark has percentile_approx for
direct queries but no storable/mergeable quantile state, so this module
provides one the Spark-native way:

- the sketch is a `map<int, long>` column of log-spaced bucket counts
  (multiplicative buckets: bucket = floor(ln(x)/ln(1+2*eps)), giving a
  bounded RELATIVE value error of ~eps, HdrHistogram-style — same accuracy
  contract qdigest documents for non-negative values);
- building and merging are plain groupBy aggregations over exploded
  entries (map-side partial aggs, no UDFs, arbitrarily re-mergeable);
- value_at_quantile walks the sorted buckets with an `aggregate` lambda —
  a pure expression, evaluated JVM-side.

Binary layout is engine-specific (not Trino-interoperable — same policy as
the HLL sketches, COVERAGE.md Known gaps).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_EPS = 0.01


def _log_base(eps: float) -> float:
    return math.log(1.0 + 2.0 * eps)


def bucket_of(value: Column | str, eps: float = DEFAULT_EPS) -> Column:
    """Log-spaced bucket index for a positive value (0 and negatives map to
    bucket MIN_INT — kept but reported as 0.0)."""
    v = F.col(value) if isinstance(value, str) else value
    idx = F.floor(F.log(v) / F.lit(_log_base(eps))).cast("int")
    return F.when(v > 0, idx).otherwise(F.lit(-(1 << 31)))


def qsketch_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    eps: float = DEFAULT_EPS,
    out: str = "qsketch",
) -> DataFrame:
    """One sketch per group: groupBy (keys, bucket) -> counts -> map."""
    b = bucket_of(value_col, eps).alias("_bucket")
    counted = df.select(*group_cols, b).groupBy(*group_cols, "_bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return counted.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_bucket", "_n")))
        ).alias(out)
    )


def qsketch_merge(
    df: DataFrame, group_cols: list[str], sketch_col: str = "qsketch", out: str | None = None
) -> DataFrame:
    """Merge sketches across rows (Trino merge(qdigest)): explode entries,
    sum per bucket, rebuild — associative and shuffle-light (entries are
    ~log(range)/eps per sketch regardless of input size)."""
    out = out or sketch_col
    entries = df.select(
        *group_cols, F.explode(F.map_entries(F.col(sketch_col))).alias("_e")
    ).select(*group_cols, F.col("_e.key").alias("_bucket"), F.col("_e.value").alias("_n"))
    summed = entries.groupBy(*group_cols, "_bucket").agg(F.sum("_n").alias("_n"))
    return summed.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_bucket", "_n")))
        ).alias(out)
    )


def qsketch_merge_maps(
    df: DataFrame, group_cols: list[str], sketch_col: str = "qsketch", out: str | None = None
) -> DataFrame:
    """Merge sketches across rows with a single aggregation: collect the
    (small, ~log(range)/eps-entry) maps and fold them with map_zip_with —
    no explode, no second shuffle. Preferred over `qsketch_merge` when the
    number of sketches per output group is modest (the daily-rollup case);
    `qsketch_merge`'s explode path keeps agg buffers O(buckets) when
    merging millions of sketches into one group."""
    out = out or sketch_col
    merged = F.aggregate(
        F.collect_list(sketch_col),
        F.create_map().cast("map<int,bigint>"),
        lambda acc, m: F.map_zip_with(
            acc,
            m,
            lambda _k, v1, v2: F.coalesce(v1, F.lit(0).cast("long"))
            + F.coalesce(v2, F.lit(0).cast("long")),
        ),
    )
    canonical = F.map_from_entries(F.sort_array(F.map_entries(merged)))
    return df.groupBy(*group_cols).agg(canonical.alias(out))


def values_at_quantiles(
    sketch: Column | str, qs: list[float], eps: float = DEFAULT_EPS
) -> Column:
    """array<double> of quantile estimates for all targets in `qs` from ONE
    fold over the sketch (Trino values_at_quantiles,
    QuantileDigestFunctions.java:40) — n targets cost one pass, not n."""
    m = F.col(sketch) if isinstance(sketch, str) else sketch
    entries = F.sort_array(F.map_entries(m))
    total = F.aggregate(entries, F.lit(0).cast("long"), lambda acc, e: acc + e["value"])
    targets = F.transform(
        F.array(*[F.lit(float(q)) for q in qs]),
        lambda q: F.ceil(q * total.cast("double")).cast("long"),
    )
    init = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.array_repeat(F.lit(None).cast("int"), len(qs)).alias("buckets"),
    )
    found = F.aggregate(
        entries,
        init,
        lambda acc, e: F.struct(
            (acc["cum"] + e["value"]).alias("cum"),
            F.transform(
                acc["buckets"],
                lambda b, i: F.when(
                    b.isNull() & (acc["cum"] + e["value"] >= F.element_at(targets, i + 1)),
                    e["key"],
                ).otherwise(b),
            ).alias("buckets"),
        ),
    )["buckets"]
    lb = F.lit(_log_base(eps))
    return F.transform(
        found,
        lambda b: F.when(b == F.lit(-(1 << 31)), F.lit(0.0)).otherwise(
            F.exp((b.cast("double") + 0.5) * lb)
        ),
    )


def value_at_quantile(
    sketch: Column | str, q: float, eps: float = DEFAULT_EPS
) -> Column:
    """Estimate the q-quantile from a sketch map: find the first bucket
    whose cumulative count reaches q*total, return its geometric midpoint.
    Pure `aggregate` expression — no UDF, no collect."""
    m = F.col(sketch) if isinstance(sketch, str) else sketch
    entries = F.sort_array(F.map_entries(m))  # sorted by bucket = by value
    total = F.aggregate(entries, F.lit(0).cast("long"), lambda acc, e: acc + e["value"])
    target = F.ceil(F.lit(q) * total.cast("double")).cast("long")
    # fold: (cum, found_bucket) — take the first bucket where cum >= target
    found = F.aggregate(
        entries,
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(None).cast("int").alias("bucket"),
        ),
        lambda acc, e: F.struct(
            (acc["cum"] + e["value"]).alias("cum"),
            F.when(
                acc["bucket"].isNull() & (acc["cum"] + e["value"] >= target), e["key"]
            )
            .otherwise(acc["bucket"])
            .alias("bucket"),
        ),
    )["bucket"]
    mid = F.exp((found.cast("double") + 0.5) * F.lit(_log_base(eps)))
    return F.when(found == F.lit(-(1 << 31)), F.lit(0.0)).otherwise(mid)
