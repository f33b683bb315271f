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

Scale note: a naive build would `collect_set` ALL distinct hashes per
group before slicing to k — unbounded agg-buffer memory for high-NDV
groups. `make_set_digest` therefore pre-filters: a first cheap pass
estimates each group's NDV (approx_count_distinct — map-side partial,
tiny state), and only hashes below `safety*k/est * 2^62` enter the
collect_set. Hash uniformity makes the survivors a superset of the true
bottom-k w.h.p. (P[fewer than k of est survive] is a lower-tail
Binomial(est, safety*k/est) bound — Chernoff gives < 1e-200 at k=512,
safety=4), so the digest is identical to the unfiltered build
(equivalence asserted in tests) while the buffer holds ~safety*k values
instead of the group's full distinct set. Binary layout is
engine-specific (not Trino-interoperable — same policy as the HLL/qdigest
sketches, COVERAGE.md Known gaps).
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
    out: str = "digest", safety: int = 4,
) -> DataFrame:
    """One digest per group (Trino make_set_digest aggregate).

    Two passes: (1) approx NDV per group, (2) bottom-k build over only the
    hashes below `safety*k/est` of the hash range — see module docstring
    for why the result is identical to the unfiltered build. The HLL half
    still sees every value (its state is constant-size anyway)."""
    base = df.select(*group_cols, _c(value_col).alias("_v"), _hash64(value_col).alias("_h"))
    est = base.groupBy(*group_cols).agg(F.approx_count_distinct("_v").alias("_est"))
    # threshold in hash space; groups with est <= safety*k keep everything
    thr = F.when(
        F.col("_est") > safety * k,
        (F.lit(float(safety * k) * float(1 << 62)) / F.col("_est").cast("double")).cast("long"),
    ).otherwise(F.lit(1 << 62))
    joined = base.join(F.broadcast(est.select(*group_cols, thr.alias("_thr"))), group_cols)
    return joined.groupBy(*group_cols).agg(
        F.struct(
            F.hll_sketch_agg("_v").alias("hll"),
            F.slice(
                F.array_sort(F.collect_set(F.when(F.col("_h") < F.col("_thr"), F.col("_h")))),
                1,
                k,
            ).alias("mh"),
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
