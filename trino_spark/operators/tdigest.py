"""t-digest columns — mergeable rank-accurate quantile sketches.

Reference: core/trino-main scalar TDigestFunctions.java:31 +
operator/aggregation/TDigestAggregationFunction (tdigest_agg, merge,
value_at_quantile, values_at_quantiles) over spi/type/TDigestType. The
companion log-bucket sketch (operators/quantile_sketch.py) gives bounded
RELATIVE value error; t-digest gives bounded RANK error concentrated at
the tails — the two accuracy contracts Trino ships side by side.

Algorithm: the merging t-digest (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023) with the k1 scale
function k(q) = (delta / 2*pi) * asin(2q - 1): sorted centroids are
absorbed while k(q_right) - k(q_left) <= 1, which caps centroid width
near the median and forces singleton centroids at the extreme tails.

Scale shape (100 TB build):
- stage 1 computes PARTIAL digests per input partition with mapInPandas —
  raw rows never shuffle; a partition of any size reduces to
  groups x delta centroids;
- stage 2 shuffles only those digests and merges per group with
  applyInPandas — the same routine callers use to merge STORED digest
  columns, so digests written to parquet today merge with digests written
  next month (Trino's merge(tdigest) workflow).

Digest layout: two parallel arrays (means array<double>, weights
array<double>), sorted by mean — columnar, parquet-storable; binary layout
engine-specific (not Trino-interoperable, same policy as the HLL /
qdigest sketches)."""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_DELTA = 100


def _k(q: float, delta: float) -> float:
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def compress(means: np.ndarray, weights: np.ndarray, delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Merge a centroid stream into a k1-bounded digest (<= ~delta
    centroids). Input need not be sorted or compressed."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = np.asarray(means, float)[order], np.asarray(weights, float)[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    q_left = 0.0
    k_left = _k(q_left, delta)
    cm, cw = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q_right = q_left + (cw + w) / total
        if _k(q_right, delta) - k_left <= 1.0:
            cm = (cm * cw + m * w) / (cw + w)
            cw += w
        else:
            out_m.append(cm)
            out_w.append(cw)
            q_left += cw / total
            k_left = _k(q_left, delta)
            cm, cw = float(m), float(w)
    out_m.append(cm)
    out_w.append(cw)
    return np.asarray(out_m), np.asarray(out_w)


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """value_at_quantile over a digest: linear interpolation between
    centroid means at the target cumulative rank."""
    means = np.asarray(means, float)
    weights = np.asarray(weights, float)
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    # centroid i covers ranks [cum_i - w_i/2, cum_i + w_i/2) around its mean
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


def _digest_fields() -> list[T.StructField]:
    return [
        T.StructField("td_means", T.ArrayType(T.DoubleType())),
        T.StructField("td_weights", T.ArrayType(T.DoubleType())),
    ]


def tdigest_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    delta: float = DEFAULT_DELTA,
) -> DataFrame:
    """One digest per group: (group_cols..., td_means, td_weights).

    mapInPandas partial digests per partition (no raw-row shuffle), then a
    digest-only shuffle + applyInPandas merge per group."""
    key_fields = [df.schema[c] for c in group_cols]
    partial_schema = T.StructType(key_fields + _digest_fields())

    def build_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                v = g[value_col].to_numpy(dtype=float)
                v = v[~np.isnan(v)]
                if not len(v):
                    continue
                m, w = compress(v, np.ones_like(v), delta)
                rows.append((*key, list(m), list(w)))
            if rows:
                yield pd.DataFrame(rows, columns=[*group_cols, "td_means", "td_weights"])

    partials = df.select(*group_cols, value_col).mapInPandas(build_partials, partial_schema)
    return merge_digests(partials, group_cols, delta)


def merge_digests(
    df: DataFrame, group_cols: list[str], delta: float = DEFAULT_DELTA
) -> DataFrame:
    """merge(tdigest) aggregation: combine stored digests per group into
    one digest — re-mergeable arbitrarily (partition-, day-, table-level)."""
    key_fields = [df.schema[c] for c in group_cols]
    out_schema = T.StructType(key_fields + _digest_fields())

    def merge_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(x, float) for x in pdf["td_means"]])
        weights = np.concatenate([np.asarray(x, float) for x in pdf["td_weights"]])
        m, w = compress(means, weights, delta)
        return pd.DataFrame([(*key, list(m), list(w))], columns=[*group_cols, "td_means", "td_weights"])

    return df.groupBy(*group_cols).applyInPandas(merge_group, out_schema)


def with_quantiles(
    digests: DataFrame, qs: list[float], group_cols: list[str], round_to: int = 4
) -> DataFrame:
    """values_at_quantiles read: one column per requested quantile."""
    from pyspark.sql import functions as F

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _vals(means: pd.Series, weights: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [round(quantile(np.asarray(m, float), np.asarray(w, float), q), round_to) for q in qs]
                for m, w in zip(means, weights)
            ]
        )

    out = digests.withColumn("_qv", _vals("td_means", "td_weights"))
    cols = [*group_cols] + [
        F.element_at("_qv", i + 1).alias(f"q{str(q).replace('.', '_')}")
        for i, q in enumerate(qs)
    ]
    return out.select(*cols)
