"""Document chunking — fixed-size sliding windows with overlap.

The step between cleaning and embedding/packing in a training-data or
RAG pipeline: each document becomes ceil((len - overlap) / stride)
character windows of `size` chars, consecutive windows sharing `overlap`
chars. No Trino analog (extension tier, like dedup/packing).

Scale shape: pure expressions — `sequence()` builds the window indices,
`explode` fans them out, `substring` slices; everything stays inside
whole-stage codegen, no UDF, no shuffle beyond whatever the caller does
with the chunks. A 100 TB corpus chunks at scan speed; the fan-out
factor is bounded by max(len)/stride per row.

Windows are exact character slices (no boundary snapping) so the
operation is deterministic and oracle-checkable; token-aware or
sentence-snapped variants belong to the caller's tokenizer pass
(operators/text.py token_count is the companion estimate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = 200,
    overlap: int = 40,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Output: id_cols + (chunk_id, chunk_start, chunk_text) — chunk_start
    is 1-based (SQL substring convention). The final window is the
    (possibly shorter) tail; a document shorter than `size` yields
    exactly one chunk. `size > overlap >= 0` required.
    """
    if not size > overlap >= 0:
        raise ValueError("require size > overlap >= 0")
    stride = size - overlap
    n = F.greatest(
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n - F.lit(1))).alias("chunk_id")
    out = df.select(*[F.col(c) for c in id_cols], F.col(text_col), idx)
    start: Column = (F.col("chunk_id") * stride + 1).cast("int")
    return out.select(
        *[F.col(c) for c in id_cols],
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.alias("chunk_start"),
        F.substring(F.col(text_col), start, size).alias("chunk_text"),
    )
