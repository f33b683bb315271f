"""N-gram language-model perplexity scoring for corpus quality filtering.

The CCNet recipe (Wenzek et al. 2020, public): score every document's
perplexity under a language model trained on a trusted corpus; low
perplexity ~ fluent prose, high ~ gibberish/boilerplate. Production uses
KenLM; the distributed-native equivalent here is a word-bigram model with
add-one smoothing — exactly SQL-expressible, so the whole pass (train +
score) stays inside Catalyst codegen and the DuckDB oracle can recompute
it verbatim.

Shapes at 100 TB:
- Training = one explode + two hash aggregations (bigram counts, unigram
  counts) over the trusted corpus. The model is a table, not driver state.
- Scoring = explode each document's bigrams, equi-join the model
  (broadcast when pruned to top-K — the `top_k` knob bounds model size
  the way KenLM pruning does), per-document aggregation of -log p.
- Backoff for unseen bigrams is the smoothing floor 1/(c(w1)+V), and for
  unseen history words 1/V — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return df.select(
        id_col, F.posexplode(F.filter(w, lambda x: F.length(x) > 0)).alias("pos", "w")
    )


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    w = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: F.length(x) > 0)
    pairs = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(id_col, F.explode(F.when(F.size(w) >= 2, pairs).otherwise(F.array())).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_k: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """Train the model on a corpus: returns (bigram table with smoothed
    conditional log-prob, unigram count table, vocabulary size V).

    add-one smoothing: p(w2|w1) = (c12 + 1) / (c1 + V); the V count is the
    one scalar collected driver-side."""
    bigrams = _doc_bigrams(df, text_col, id_col).groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    unigrams = _doc_words(df, text_col, id_col).groupBy("w").agg(F.count("*").alias("c1"))
    vocab_size = unigrams.count()
    lm = (
        bigrams.join(unigrams.withColumnRenamed("w", "w1"), "w1")
        .select(
            "w1",
            "w2",
            F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(float(vocab_size)))).alias("logp"),
        )
    )
    if top_k is not None:
        # KenLM-style pruning: keep the K most frequent bigrams; everything
        # else takes the backoff floor. Bounds the broadcast model size.
        lm = (
            bigrams.orderBy(F.col("c12").desc(), "w1", "w2")
            .limit(top_k)
            .join(unigrams.withColumnRenamed("w", "w1"), "w1")
            .select(
                "w1",
                "w2",
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(float(vocab_size)))).alias("logp"),
            )
        )
    return lm, unigrams, vocab_size


def score_perplexity(
    df: DataFrame,
    lm: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document bigram perplexity: exp(mean -log p(w2|w1)). Documents
    with <2 words get NULL. Unseen bigram -> floor 1/(c1+V); unseen
    history word -> 1/V."""
    V = float(vocab_size)
    model = F.broadcast(lm) if broadcast_model else lm
    uni = unigrams.withColumnRenamed("w", "w1")
    uni = F.broadcast(uni) if broadcast_model else uni
    scored = (
        _doc_bigrams(df, text_col, id_col)
        .join(model, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .select(
            id_col,
            F.coalesce(
                F.col("logp"),
                F.log(1.0 / (F.coalesce(F.col("c1").cast("double"), F.lit(0.0)) + V)),
            ).alias("lp"),
        )
    )
    return (
        df.select(id_col)
        .join(
            scored.groupBy(id_col).agg(F.exp(-F.avg("lp")).alias("perplexity")),
            id_col,
            "left",
        )
    )
