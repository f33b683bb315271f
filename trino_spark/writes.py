"""Write path: CTAS / INSERT / partitioned overwrite.

Trino's write path is TableWriterOperator -> TableFinishOperator commit
(reference: core/trino-main/.../operator/TableWriterOperator.java:69,
TableFinishOperator.java:55) with connector page sinks. Spark's committers
own the same job here: `df.write` gives atomic-enough directory commits
(_SUCCESS markers, task-attempt isolation), so these helpers only encode
the policies — layout, mode, partitioning — not a commit protocol.

Scale notes:
- `partition_by` produces hive-style directory partitioning, the layout
  every downstream scan prunes on (static partition pruning + DPP).
- `target_file_rows` repartitions before write so output files are
  uniformly sized — the 100 TB failure mode is thousands of tiny files per
  partition from over-parallel writers (AQE coalescing covers the shuffle
  side; writers need an explicit repartition on the partition columns).
- Dynamic partition overwrite replaces only touched partitions —
  the idempotent backfill primitive.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def ctas(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compact_to: int | None = None,
) -> None:
    """CREATE TABLE AS SELECT onto a filesystem path."""
    if compact_to:
        df = (
            df.repartition(compact_to, *partition_by)
            if partition_by
            else df.coalesce(compact_to)
        )
    w = df.write.format(format).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def insert_into(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """INSERT INTO semantics: append to an existing table location.

    `partition_by` must match the table's existing layout — appending
    unpartitioned files into a hive-partitioned directory leaves them
    invisible to partition-discovering readers.
    """
    w = df.write.format(format).mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """INSERT OVERWRITE only the partitions present in `df` (dynamic mode) —
    Trino's metadata-only partition replace analog
    (main/operator/TableMutationOperator.java)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.format("parquet").mode("overwrite").partitionBy(*partition_by).save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_back(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    return spark.read.format(format).load(path)


def ctas_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """CTAS into a hash-bucketed (optionally sort-ordered) managed table.

    The Spark analog of Trino's partitioned-table write with a bucketing
    function (spi/connector/ConnectorBucketNodeMap, Hive-connector
    bucketed tables): rows are hash-placed into `buckets` files per
    partition by `bucket_cols`. The payoff is at read time — two tables
    bucketed on their join key with the same bucket count sort-merge-join
    WITHOUT a shuffle on either side (Exchange elided by
    EnsureRequirements), which at 100 TB turns the nightly fact-to-fact
    join from the dominant shuffle into a local merge. Verified by plan
    assertion in tests/test_writes_streaming.py.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A managed-table location can survive the catalog entry (fresh session,
    # previous run's warehouse dir on disk): clear it or saveAsTable fails
    # with LOCATION_ALREADY_EXISTS.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def blackhole(df: DataFrame) -> None:
    """Discarding sink (reference: plugin/trino-blackhole) — executes the
    full plan, writes nothing. Spark's `noop` DSv2 sink is exactly this;
    it is also what bench.py uses to force execution without driver
    materialization."""
    df.write.format("noop").mode("overwrite").save()
