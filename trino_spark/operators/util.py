"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Rebalance a narrow projection across the cluster before CPU-heavy
    per-row work (shingling, hashing, vector math).

    Motivation: scan parallelism equals the number of file splits — a
    single-row-group parquet file (or a heavily filtered scan) yields ONE
    task, serializing everything downstream until the first shuffle. The
    same discipline applies at 100 TB: after a selective filter, rebalance
    before expensive per-row expressions. Only repartitions when the input
    has fewer partitions than the target, so well-split sources pay
    nothing.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
