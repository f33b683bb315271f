"""Z-order (Morton) clustered writes — multi-column data-skipping layout.

Role: at 100 TB, scan cost is decided by how many files a filter can
skip. Sorting by one column only prunes that column; interleaving the
bits of several columns (Morton curve) gives every interleaved column
locality, so parquet min/max footer stats prune files for filters on ANY
of them. This is the same layout lever Trino users reach for via
Iceberg/Delta table maintenance (sort-order / OPTIMIZE ZORDER BY); the
reference engine itself delegates it to the table format, we provide it
as a write-path operator.

Implementation is expression-only: per-column min/max from ONE small
aggregate (the only driver-side collect, O(#cols) values), linear
scaling to `bits`-bit ints, then bit interleave via a sequence fold with
floor-division by powers of two (exact in doubles up to 2^52, same trick
as functions/tiles.py). `repartitionByRange` on the key gives
equal-sized files, each covering a compact Morton range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 12  # per column; 2 cols -> 24-bit key, 3 cols -> 36-bit


def _scaled(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Value -> integer bucket in [0, 2^bits): linear min/max scaling."""
    n = float((1 << bits) - 1)
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.round(frac * F.lit(n)).cast("long")


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton key: bit j of column i lands at position j*len(cols)+i."""
    # Unrolled in Python (bits is a plan-time constant): ncols*bits plain
    # shift/mask terms, fully inside whole-stage codegen. The
    # aggregate(sequence(...)) HOF formulation of the same fold evaluated
    # a lambda per bit per row and cost 28 s on a 600k-row write vs ~4 s
    # unrolled (PERF.md).
    ncols = len(scaled)
    terms = []
    for i, c in enumerate(scaled):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            terms.append(bit * F.lit(1 << (j * ncols + i)))
    key = terms[0]
    for t_ in terms[1:]:
        key = key + t_
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton key column over `cols` (numeric/date). One tiny agg collects
    the per-column min/max used for scaling."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    scaled = [
        _scaled(F.col(c), F.lit(row[f"_lo_{c}"]), F.lit(row[f"_hi_{c}"]), bits)
        for c in cols
    ]
    return _interleave(scaled, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
    format: str = "parquet",
) -> None:
    """Write `df` clustered along the Morton curve of `cols`: range
    partition on the key (equal-sized, contiguous Morton slices per file)
    and sort within files so row groups carry tight min/max stats."""
    key = zorder_key(df, cols, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.format(format)
        .mode("overwrite")
        .save(path)
    )
