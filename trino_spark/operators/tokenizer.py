"""Distributed BPE tokenizer training: corpus-scale pair counting and
merge learning for vocabulary construction.

The training-data-pipeline step that turns a raw corpus into a subword
vocabulary (byte-pair encoding, Sennrich et al. 2016 — public algorithm).
The industrial-scale shape (and ours):

1. ONE pass over the corpus: whitespace-tokenize, count word frequencies.
   This is the only operation that touches all 100 TB — a single
   explode + hash aggregation on the word.
2. Training then operates on the DISTINCT weighted vocabulary (Heaps' law:
   |vocab| << corpus size), each word held as an array of symbols.
   Every merge iteration is:
     a. pair statistics: explode adjacent symbol pairs weighted by word
        frequency, hash-aggregate, take the global top pair (a 1-row
        collect — bounded driver data, same policy as IVF k-means
        training);
     b. apply the merge to the vocab: a left-to-right non-overlapping
        fold per word — a pure `aggregate` HOF expression, JVM-side.
   `localCheckpoint` every few rounds truncates the iterative lineage
   (the connected-components lesson: planner cost, not data, dominates
   iterative Spark jobs).

No Python executes per token anywhere; the only driver-side data is one
(pair, count) row per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_vocab(df: DataFrame, text_col: str = "text", min_len: int = 2) -> DataFrame:
    """Corpus -> (word, freq) weighted vocabulary. The one full-corpus
    pass; everything after operates on distinct words only."""
    w = F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word")
    return (
        df.select(w)
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def to_symbols(vocab: DataFrame) -> DataFrame:
    """word -> array of single-character symbols (byte-level start state)."""
    return vocab.select(
        "word", "freq", F.filter(F.split("word", ""), lambda s: F.length(s) > 0).alias("syms")
    )


def pair_stats(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: one explode + one
    hash aggregation over the vocab (not the corpus)."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice("syms", 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        symbols.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def top_pair(symbols: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent pair; deterministic tiebreak (cnt DESC,
    a ASC, b ASC). The 1-row collect per iteration."""
    row = (
        pair_stats(symbols)
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
        .collect()
    )
    if not row:
        return None
    return row[0].a, row[0].b, row[0].cnt


def apply_merge(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Replace adjacent (a, b) with the merged symbol a+b, left-to-right
    non-overlapping — a single-pass fold as a pure `aggregate` expression
    with a (emitted-array, pending-symbol) accumulator."""
    merged = F.lit(a + b)
    folded = F.aggregate(
        F.col("syms"),
        F.struct(
            F.array().cast("array<string>").alias("arr"),
            F.lit(None).cast("string").alias("pend"),
        ),
        lambda acc, s: F.when(
            acc["pend"].isNull(), F.struct(acc["arr"].alias("arr"), s.alias("pend"))
        )
        .when(
            (acc["pend"] == a) & (s == b),
            F.struct(
                F.concat(acc["arr"], F.array(merged)).alias("arr"),
                F.lit(None).cast("string").alias("pend"),
            ),
        )
        .otherwise(
            F.struct(F.concat(acc["arr"], F.array(acc["pend"])).alias("arr"), s.alias("pend"))
        ),
        lambda acc: F.when(acc["pend"].isNull(), acc["arr"]).otherwise(
            F.concat(acc["arr"], F.array(acc["pend"]))
        ),
    )
    return symbols.select("word", "freq", folded.alias("syms"))


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 3,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges; returns (merge list, final symbol
    vocab). Iteration cost is O(|vocab|) per round, independent of corpus
    size after the first pass."""
    symbols = to_symbols(word_vocab(df, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        best = top_pair(symbols)
        if best is None or best[2] < 2:
            break
        a, b, _ = best
        merges.append((a, b))
        symbols = apply_merge(symbols, a, b)
        if (i + 1) % checkpoint_every == 0:
            symbols = symbols.localCheckpoint(eager=True)
    return merges, symbols
