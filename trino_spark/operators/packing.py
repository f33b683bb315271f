"""Sequence packing — fill fixed token-budget context windows with docs.

The last step of a pre-training data pipeline: examples are concatenated
into fixed-length contexts (e.g. 2048/4096/8192 tokens) to avoid padding
waste. No Trino analog (pure extension tier, like the dedup family).

Greedy first-fit-on-a-stream packing: walk docs in a deterministic order,
accumulate until the next doc would overflow the budget, then open a new
pack. Oversized docs (> budget) become singleton packs (truncation is the
caller's policy).

Scale shape: packing is PER PARTITION — each executor packs its own
id-ordered slice independently (applyInPandas over a partition key), so
the operation is embarrassingly parallel and the only shuffle is the
range partitioning that makes slices contiguous. Local packing loses at
most one partial pack per partition vs a global sequential pass —
negligible at 100 TB where a partition holds millions of docs."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "part int, pack_id bigint, n_docs int, total_tokens bigint, fill_ratio double"
)


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_parts: int | None = None,
) -> DataFrame:
    """(part, pack_id, n_docs, total_tokens, fill_ratio) per pack.

    Docs are range-partitioned and id-ordered so the packing is
    deterministic for a fixed `n_parts`; pack_id numbers packs within a
    partition (globally unique as (part, pack_id))."""
    base = df.select(F.col(id_col).alias("_id"), F.col(tokens_col).cast("long").alias("_tok"))
    if n_parts is not None:
        base = base.repartitionByRange(n_parts, "_id")
    base = base.sortWithinPartitions("_id").withColumn(
        "_part", F.spark_partition_id()
    )

    cols = ["part", "pack_id", "n_docs", "total_tokens", "fill_ratio"]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the iterator spans ONE partition in multiple Arrow batches, so
        # the open pack carries across batch boundaries
        fill = n_docs = pack_id = 0
        part = None
        for pdf in batches:
            if not len(pdf):
                continue
            part = int(pdf["_part"].iloc[0])
            recs = []
            for tok in pdf["_tok"]:
                tok = int(tok)
                if n_docs and fill + tok > budget:
                    recs.append((part, pack_id, n_docs, fill, fill / budget))
                    pack_id += 1
                    fill, n_docs = 0, 0
                fill += tok
                n_docs += 1
            if recs:
                yield pd.DataFrame(recs, columns=cols)
        if part is not None and n_docs:
            yield pd.DataFrame(
                [(part, pack_id, n_docs, fill, fill / budget)], columns=cols
            )

    return base.mapInPandas(pack, PACK_SCHEMA)
