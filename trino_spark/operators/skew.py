"""Skew-handling join utilities.

Trino rebalances skew at the exchange/writer level
(main/operator/output/SkewedPartitionRebalancer.java) and Spark's AQE
handles skewed SHUFFLE joins automatically (session.py enables
spark.sql.adaptive.skewJoin). What AQE cannot fix is a broadcast-ineligible
join where a handful of hot keys dominate a shuffle: the classic remedy is
key salting — explode the build side into S replicas and scatter the probe
side across them. This module packages that rewrite with correct semantics
(inner and left joins).

Scale notes: salting multiplies the build side by S (choose S ≈ ratio of
hottest-key row count to the average) but converts one straggler task into
S uniform tasks. Use for power-law keys (user_id, domain, token) where the
top key holds >1/parallelism of all rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `on` with the RIGHT side replicated across num_salts
    buckets and the LEFT side scattered uniformly (hash of its full row
    spread via a deterministic pmod over a monotonic id is avoided — the
    scatter key must not correlate with the join key, so we hash the
    left row's other columns)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    scatter_cols = [c for c in left.columns if c != on] or [on]
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in scatter_cols]), F.lit(num_salts))
    )
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = l_salted.join(r_salted, [on, "__salt"], how)
    return joined.drop("__salt")
