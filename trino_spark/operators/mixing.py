"""Corpus composition operators: deterministic global shuffle and
domain-mixture sampling to a token budget.

Training-data pipeline tier (no Trino analog — extension components like
the dedup family): before training, a corpus is (a) SHUFFLED so batches
are i.i.d. across sources/time, and (b) MIXED — each domain/source
contributes a weighted share of the token budget (the mixture-weights
step of public LLM data recipes).

Scale shapes (100 TB design):
- `global_shuffle` derives a 60-bit key from md5(stable id, seed) and
  hash-repartitions + sorts WITHIN partitions on it: exactly ONE shuffle,
  deterministic w.r.t. input layout (the key depends only on row identity,
  never on partition/order), no driver collect, no skew (md5 is uniform).
  `orderBy(rand())` would be neither deterministic nor cheaper (total sort
  = range exchange + sort); per-partition order is what data loaders need.
- `mixture_sample` is one window pass per source partition (cumulative
  token sums over a deterministic md5 rank) + a filter — no all-pairs, no
  iteration; the only driver-side value is the scalar total-token count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def shuffle_key(id_col: Column, seed: int = 42) -> Column:
    """Deterministic uniform 60-bit key: md5 of (id '#' seed), first 15
    hex digits as an integer. Cross-engine reproducible (DuckDB:
    CAST('0x' || substr(md5(...), 1, 15) AS BIGINT))."""
    h = F.md5(F.concat_ws("#", id_col.cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def global_shuffle(
    df: DataFrame, id_col: str, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Reproducible corpus shuffle: rows land in a pseudo-random but
    deterministic partition + order, fixed by (id, seed) alone."""
    keyed = df.withColumn("_shuffle_key", shuffle_key(F.col(id_col), seed))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartition(parts, F.col("_shuffle_key"))
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )


def token_count(text_col: Column) -> Column:
    """Whitespace token estimate, identical in Spark and DuckDB
    (trim first so neither engine counts boundary empties)."""
    return F.size(F.split(F.trim(text_col), r"\s+"))


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    token_budget: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents per source until each source's token target
    (weight x budget) is reached, in a deterministic md5-ranked order.

    Greedy prefix rule: a doc is kept while the RUNNING total BEFORE it is
    under the target (so the boundary doc that crosses the target is the
    last one in) — the standard reproducible way to hit a mixture quota
    without a second pass. Sources absent from `weights` are dropped.
    Adds `_tokens` (per-doc estimate) for downstream accounting."""
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    d = (
        df.withColumn("_tokens", token_count(F.col(text_col)).cast("long"))
        .withColumn("_target", wmap[F.col(source_col)] * F.lit(float(token_budget)))
        .filter(F.col("_target").isNotNull())
        .withColumn("_rank_key", F.md5(F.concat_ws("#", F.col(id_col).cast("string"))))
    )
    win = (
        W.partitionBy(source_col)
        .orderBy("_rank_key")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("_tokens").over(win), F.lit(0))
    return (
        d.withColumn("_prior_tokens", prior)
        .filter(F.col("_prior_tokens") < F.col("_target"))
        .drop("_target", "_rank_key", "_prior_tokens")
    )


def shard_by_token_budget(
    df: DataFrame, id_col: str, capacity: float, text_col: str = "text"
) -> DataFrame:
    """Assign documents to contiguous token-budget shards (`_shard`) in a
    deterministic md5 order — the balanced-output-files step of a corpus
    pipeline (each shard holds ~`capacity` tokens, in rank order, so
    training shards are uniformly sized regardless of document skew).

    Scale shape: the global running sum is computed WITHOUT a single-
    partition sort — rows are bucketed by the first hex digit of their
    rank key (16 buckets, each a window partition), bucket totals (16
    scalars — metadata-scale driver traffic) become bucket offsets, and
    global_prior = bucket_offset + within-bucket prefix sum. Because the
    bucket is a PREFIX of the rank key, (bucket, key) order IS global key
    order. At 100 TB widen to 2 hex digits (256 buckets)."""
    d = (
        df.withColumn("_tokens", token_count(F.col(text_col)).cast("long"))
        .withColumn("_rk", F.md5(F.col(id_col).cast("string")))
        .withColumn("_bucket", F.substring("_rk", 1, 1))
    )
    totals = {
        r[0]: r[1]
        for r in d.groupBy("_bucket").agg(F.sum("_tokens").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    win = (
        W.partitionBy("_bucket")
        .orderBy("_rk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("_tokens").over(win), F.lit(0)) + omap[F.col("_bucket")]
    return d.withColumn(
        "_shard", F.floor(prior / F.lit(float(capacity))).cast("long")
    ).drop("_rk", "_bucket")
