"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None, enabled: bool = True) -> DataFrame:
    """Rebalance a narrow projection across the cluster before CPU-heavy
    per-row work (shingling, hashing, vector math).

    Motivation: scan parallelism equals the number of file splits — a
    single-row-group parquet file (or a heavily filtered scan) yields ONE
    task, serializing everything downstream until the first shuffle. The
    repartition is unconditional: inspecting the input's partition count
    first (df.rdd.getNumPartitions) forces a full physical-planning pass
    per query BUILD on the driver, which costs more than the shuffle of a
    narrow projection saves. Callers whose input is already well-split
    (e.g. a 100 TB scan with thousands of splits) pass enabled=False —
    the target below would otherwise SHRINK their parallelism.
    """
    if not enabled:
        return df
    spark = df.sparkSession
    target = min_partitions or max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return df.repartition(target)
