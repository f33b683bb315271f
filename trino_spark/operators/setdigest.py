"""Mergeable SetDigest columns — Trino's setdigest type.

Reference: main/type/setdigest/SetDigest.java + SetDigestFunctions.java
(make_set_digest, merge_set_digest, cardinality, intersection_cardinality,
jaccard_index). Trino's SetDigest pairs a HyperLogLog with a bottom-k
MinHash (k smallest 64-bit hashes of the distinct values); the HLL answers
cardinality, the MinHash answers Jaccard/intersection between digests.

Spark-native layout: a struct column
    {hll: binary        -- Spark hll_sketch_agg sketch,
     mh:  array<long>   -- the k smallest non-negative xxhash64 values}
Both halves build with plain aggregations (map-side partial agg, no UDFs)
and re-merge associatively, so digests can be stored per partition/day and
rolled up later exactly like Trino's merge_set_digest.

Bottom-k theory: for the union U of two sets hashed uniformly, the k
smallest hashes of U are a uniform sample of U, so
|bottom_k(U) ∩ A ∩ B| / k estimates the Jaccard index (Broder 1997 —
same estimator SetDigestFunctions.java uses). Within a digest `mh` is the
bottom-k of that set's distinct hashes; across digests the union's
bottom-k is recomputed from the concatenation, which is exact because
bottom_k(A ∪ B) ⊆ bottom_k(A) ∪ bottom_k(B).

Scale note: the build aggregates `collect_set` of hashes per group before
slicing to k. That is bounded by the group's DISTINCT count; for
very-high-cardinality groups pre-filter hashes below k/est_card * 2^31
(uniformity makes the survivors a superset of the true bottom-k) — the
digests themselves stay k-bounded either way, so merges and comparisons
never grow. Binary layout is engine-specific (not Trino-interoperable —
same policy as the HLL/qdigest sketches, COVERAGE.md Known gaps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Trino's SetDigest keeps up to 8192 minhash entries; 512 gives a Jaccard
# std-error of sqrt(J(1-J)/k) <= 0.023 at a fraction of the array cost.
DEFAULT_K = 512


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _hash64(col: Column | str) -> Column:
    # Non-negative 63-bit hash so array_sort order == numeric bottom-k.
    return F.pmod(F.xxhash64(_c(col)), F.lit(1 << 62))


def make_set_digest(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = DEFAULT_K,
    out: str = "digest",
) -> DataFrame:
    """One digest per group (Trino make_set_digest aggregate)."""
    h = _hash64(value_col).alias("_h")
    return df.select(*group_cols, _c(value_col).alias("_v"), h).groupBy(*group_cols).agg(
        F.struct(
            F.hll_sketch_agg("_v").alias("hll"),
            F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("mh"),
        ).alias(out)
    )


def merge_set_digest(
    df: DataFrame, group_cols: list[str], digest_col: str = "digest",
    k: int = DEFAULT_K, out: str | None = None,
) -> DataFrame:
    """Merge digests across rows (Trino merge_set_digest): HLL union +
    bottom-k of the union of the minhash sets."""
    out = out or digest_col
    d = F.col(digest_col)
    merged = df.select(*group_cols, d["hll"].alias("_hll"), d["mh"].alias("_mh"))
    return merged.groupBy(*group_cols).agg(
        F.struct(
            F.hll_union_agg("_hll").alias("hll"),
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("_mh")))), 1, k
            ).alias("mh"),
        ).alias(out)
    )


def cardinality(digest: Column | str) -> Column:
    """Estimated distinct count (Trino cardinality(setdigest))."""
    return F.hll_sketch_estimate(_c(digest)["hll"])


def jaccard_index(a: Column | str, b: Column | str, k: int = DEFAULT_K) -> Column:
    """Bottom-k Jaccard estimate between two digests
    (SetDigestFunctions.java jaccard_index)."""
    amh, bmh = _c(a)["mh"], _c(b)["mh"]
    union_k = F.slice(F.array_sort(F.array_union(amh, bmh)), 1, k)
    in_both = F.size(F.array_intersect(F.array_intersect(union_k, amh), bmh))
    return in_both.cast("double") / F.size(union_k)


def intersection_cardinality(a: Column | str, b: Column | str, k: int = DEFAULT_K) -> Column:
    """|A ∩ B| ≈ J(A,B) * |A ∪ B| with the union size from the merged HLLs
    (SetDigestFunctions.java intersection_cardinality)."""
    union_card = F.hll_sketch_estimate(F.hll_union(_c(a)["hll"], _c(b)["hll"]))
    return F.round(jaccard_index(a, b, k) * union_card.cast("double")).cast("long")
