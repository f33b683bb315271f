"""Array function gaps (reference: main/operator/scalar/ArrayNgramsFunction.java,
ArrayCombinationsFunction.java; most of Trino's ~45 array functions map 1:1
to Spark higher-order functions — SURVEY.md §2.8).

ngrams() is load-bearing: it feeds the minhash/jaccard dedup operators.
Kept as pure expressions (sequence + transform + slice) so it runs JVM-side
inside codegen — no Python boundary on the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ngrams(arr: Column | str, n: int) -> Column:
    """Trino ngrams(array, n) -> array of n-element subarrays (sliding)."""
    a = _c(arr)
    starts = F.sequence(F.lit(1), F.greatest(F.size(a) - (n - 1), F.lit(0)))
    return F.transform(starts, lambda i: F.slice(a, i, n))


def word_ngrams(text: Column | str, n: int, sep: str = " ") -> Column:
    """n-grams over whitespace tokens, joined back to strings (the shingle
    representation used by minhash/jaccard dedup)."""
    toks = F.split(_c(text), sep)
    return F.transform(ngrams(toks, n), lambda g: F.array_join(g, sep))


def char_shingles(text: Column | str, k: int) -> Column:
    """Character k-shingles via substring sliding window."""
    s = _c(text)
    starts = F.sequence(F.lit(1), F.greatest(F.length(s) - (k - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.substring(s, i, k))


def combinations_2(arr: Column | str) -> Column:
    """Trino combinations(array, 2) — all unordered pairs as 2-arrays."""
    a = _c(arr)
    idx = F.sequence(F.lit(1), F.size(a))
    pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i + 1, F.greatest(F.size(a), i + 1)),
                lambda j: F.when(j <= F.size(a), F.array(F.element_at(a, i), F.element_at(a, j))),
            ),
        )
    )
    return F.filter(pairs, lambda p: p.isNotNull())
