"""String function parity (reference: main/operator/scalar/StringFunctions.java:70,
1068 LoC — length/substr/trim/split/split_part/replace/reverse/position/
levenshtein_distance/hamming_distance/...).

Spark has native equivalents for nearly all (split_part, levenshtein, lpad,
translate, ...). Below are the gaps, built as expression compositions so they
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Count of positions with differing code points (equal-length inputs).

    Trino: StringFunctions.java hammingDistance. Expression-only: explode the
    strings to char arrays and sum mismatches via zip_with + aggregate.
    Returns NULL (like Trino raises) when lengths differ — callers guard.
    """
    ca, cb = F.split(F.col(a) if isinstance(a, str) else a, ""), F.split(
        F.col(b) if isinstance(b, str) else b, ""
    )
    mism = F.zip_with(ca, cb, lambda x, y: F.when(x == y, 0).otherwise(1))
    dist = F.aggregate(mism, F.lit(0), lambda acc, x: acc + x)
    la = F.length(F.col(a) if isinstance(a, str) else a)
    lb = F.length(F.col(b) if isinstance(b, str) else b)
    return F.when(la == lb, dist).otherwise(F.lit(None)).cast("long")


def strpos(col: Column | str, sub: str, instance: int = 1) -> Column:
    """Trino strpos(string, substring[, instance]) — 1-based, 0 if absent."""
    c = F.col(col) if isinstance(col, str) else col
    if instance == 1:
        return F.instr(c, sub)
    # nth occurrence via split: position = len(parts[0..n-1] joined) + n*len(sub)
    parts = F.split(c, F.lit(sub).cast("string"), -1)
    enough = F.size(parts) > instance
    prefix = F.concat_ws(sub, F.slice(parts, 1, instance))
    return F.when(enough, F.length(prefix) + 1).otherwise(F.lit(0))


def levenshtein_distance(a: Column | str, b: Column | str) -> Column:
    """Trino levenshtein_distance == Spark levenshtein."""
    return F.levenshtein(F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b)


def split_part(col: Column | str, delim: str, index: int) -> Column:
    """Trino split_part (1-based; empty string when out of range) — Spark 3.5+
    has the same built-in."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split_part(c, F.lit(delim), F.lit(index))


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + strip non-alphanumerics: the
    canonicalization step used by the dedup operators (not a Trino builtin;
    mirrors common LLM-pipeline text canonicalization)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def luhn_check(col: Column | str) -> Column:
    """Luhn (mod-10) checksum validation of a digit string.

    Trino: main/operator/scalar/LuhnCheckFunction.java:25. Expression-only
    (sequence + aggregate, codegen): from the right, double every second
    digit, subtract 9 when >9, valid iff the sum is divisible by 10.
    Trino raises on non-digit input; here a non-digit poisons the sum to
    NULL (try-semantics), which callers can coalesce.
    """
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("int"),
        lambda acc, i: acc
        + F.when(
            ((n - i) % 2) == 1,
            F.when(
                F.substring(s, i, F.lit(1)).try_cast("int") * 2 > 9,
                F.substring(s, i, F.lit(1)).try_cast("int") * 2 - 9,
            ).otherwise(F.substring(s, i, F.lit(1)).try_cast("int") * 2),
        ).otherwise(F.substring(s, i, F.lit(1)).try_cast("int")),
    )
    return (n > 0) & (total % 10 == 0)
