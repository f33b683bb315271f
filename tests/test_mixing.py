"""Corpus shuffle + mixture-sampling operator tests (operators/mixing.py)."""

from pyspark.sql import functions as F

from trino_spark.catalog import load
from trino_spark.operators.mixing import (
    global_shuffle,
    mixture_sample,
    shuffle_key,
    token_count,
)


def _docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_shuffle_is_deterministic(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = global_shuffle(d, "doc_id", seed=7, num_partitions=8)
    b = global_shuffle(d, "doc_id", seed=7, num_partitions=8)
    pa = a.select("doc_id", F.spark_partition_id().alias("p")).collect()
    pb = b.select("doc_id", F.spark_partition_id().alias("p")).collect()
    assert sorted(map(tuple, pa)) == sorted(map(tuple, pb))
    # and the intra-partition ORDER is identical too
    assert [r.doc_id for r in pa] == [r.doc_id for r in pb]


def test_shuffle_seed_changes_layout(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = global_shuffle(d, "doc_id", seed=1, num_partitions=8).collect()
    b = global_shuffle(d, "doc_id", seed=2, num_partitions=8).collect()
    assert [r.doc_id for r in a] != [r.doc_id for r in b]
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_shuffle_single_exchange(spark, sf_dir):
    plan = global_shuffle(_docs(spark, sf_dir), "doc_id", num_partitions=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_shuffle_keys_spread(spark, sf_dir):
    d = _docs(spark, sf_dir).select(shuffle_key(F.col("doc_id")).alias("k"))
    buckets = d.groupBy(F.pmod("k", F.lit(16)).alias("b")).count().collect()
    n = sum(r["count"] for r in buckets)
    assert len(buckets) == 16
    assert max(r["count"] for r in buckets) < 3 * n / 16  # roughly uniform


def test_mixture_respects_targets(spark, sf_dir):
    d = _docs(spark, sf_dir)
    total = d.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    weights = {"src0": 0.6, "src1": 0.4}
    budget = 0.1 * float(total)
    sel = mixture_sample(d, "source", weights, budget)
    rows = sel.groupBy("source").agg(F.sum("_tokens").alias("tok"),
                                     F.max("_tokens").alias("mx")).collect()
    got = {r.source: r for r in rows}
    # only weighted sources survive
    assert set(got) <= {"src0", "src1"}
    for src, w in weights.items():
        # greedy prefix: total stays under target + one boundary doc
        assert got[src].tok < w * budget + got[src].mx


def test_mixture_deterministic(spark, sf_dir):
    d = _docs(spark, sf_dir)
    sel1 = mixture_sample(d, "source", {"src2": 1.0}, 500.0).select("doc_id").collect()
    sel2 = mixture_sample(d, "source", {"src2": 1.0}, 500.0).select("doc_id").collect()
    assert sorted(r.doc_id for r in sel1) == sorted(r.doc_id for r in sel2)


def test_shard_by_token_budget_balance_and_order(spark, sf_dir):
    from trino_spark.operators.mixing import shard_by_token_budget

    d = _docs(spark, sf_dir)
    sharded = shard_by_token_budget(d, "doc_id", 2000.0)
    rows = (
        sharded.groupBy("_shard")
        .agg(F.sum("_tokens").alias("tok"), F.count(F.lit(1)).alias("n"))
        .orderBy("_shard")
        .collect()
    )
    shard_ids = [r._shard for r in rows]
    assert shard_ids == list(range(len(rows)))  # contiguous from 0
    max_doc = sharded.agg(F.max("_tokens")).collect()[0][0]
    for r in rows[:-1]:  # every full shard lands within one doc of capacity
        assert 2000.0 - max_doc <= r.tok <= 2000.0 + max_doc
    # determinism
    again = shard_by_token_budget(d, "doc_id", 2000.0)
    a = {r.doc_id: r._shard for r in sharded.select("doc_id", "_shard").collect()}
    b = {r.doc_id: r._shard for r in again.select("doc_id", "_shard").collect()}
    assert a == b
