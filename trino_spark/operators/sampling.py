"""Stratified corpus sampling — language/source rebalancing.

Training-corpus composition control (the data-mixture step in public LLM
pipeline reports): downsample overrepresented strata so no group exceeds
a target multiple of the smallest (or of explicit per-stratum quotas).
No Trino analog (TABLESAMPLE is global); extension tier like the dedup
family.

Scale shape: one small groupBy-count to learn the distribution (rows =
#strata, collected), then Spark's native `sampleBy` — per-row Bernoulli
keyed by stratum, a narrow transformation with NO shuffle; a 100 TB
rebalance is a single filtered scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratum_fractions(
    df: DataFrame, stratum_col: str, max_ratio: float = 1.0
) -> dict:
    """fraction per stratum so no group ends larger than max_ratio x the
    smallest group (max_ratio=1.0 -> fully balanced)."""
    counts = {r[0]: r[1] for r in df.groupBy(stratum_col).count().collect()}
    if not counts:
        return {}
    floor = min(counts.values()) * max_ratio
    return {k: min(1.0, floor / v) for k, v in counts.items()}


def rebalance(
    df: DataFrame, stratum_col: str, max_ratio: float = 1.0, seed: int = 42
) -> DataFrame:
    """Downsample so strata sizes are within max_ratio of the smallest.
    Seeded Bernoulli per row -> deterministic for a fixed input layout."""
    fracs = stratum_fractions(df, stratum_col, max_ratio)
    return df.sampleBy(stratum_col, fracs, seed=seed)
