"""Error-bound and merge tests for SetDigest columns
(operators/setdigest.py — Trino setdigest: SetDigestFunctions.java)."""

import pytest
from pyspark.sql import functions as F

from trino_spark.operators import setdigest as sd


@pytest.fixture(scope="module")
def members(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("grp"), F.col("o_custkey").alias("ck")
    )
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exact_sets(members):
    rows = members.groupBy("grp").agg(F.collect_set("ck").alias("s")).collect()
    return {r.grp: set(r.s) for r in rows}


def test_cardinality_error_bound(members, exact_sets):
    per = sd.make_set_digest(members, ["grp"], "ck")
    est = {r.grp: r.c for r in per.select("grp", sd.cardinality("digest").alias("c")).collect()}
    for g, s in exact_sets.items():
        assert abs(est[g] - len(s)) / len(s) < 0.05, (g, est[g], len(s))


def test_jaccard_and_intersection_bounds(members, exact_sets):
    per = sd.make_set_digest(members, ["grp"], "ck")
    ref = F.broadcast(
        per.filter(F.col("grp") == "1-URGENT").select(F.col("digest").alias("ref"))
    )
    got = {
        r.grp: (r.j, r.i)
        for r in per.crossJoin(ref)
        .select(
            "grp",
            sd.jaccard_index("digest", "ref").alias("j"),
            sd.intersection_cardinality("digest", "ref").alias("i"),
        )
        .collect()
    }
    ref_set = exact_sets["1-URGENT"]
    for g, s in exact_sets.items():
        ej = len(s & ref_set) / len(s | ref_set)
        # bottom-k std error sqrt(J(1-J)/k) ~= 0.022 at k=512; allow 4 sigma
        assert abs(got[g][0] - ej) < 0.09, (g, got[g][0], ej)
        assert abs(got[g][1] - len(s & ref_set)) / max(len(s & ref_set), 1) < 0.15


def test_self_jaccard_is_one(members):
    per = sd.make_set_digest(members, ["grp"], "ck")
    vals = per.select(sd.jaccard_index("digest", "digest").alias("j")).collect()
    assert all(r.j == 1.0 for r in vals)


def test_merge_matches_direct_build(members):
    # merge(per-group digests) must equal the digest built over the union:
    # identical minhash arrays, matching HLL estimate.
    per = sd.make_set_digest(members, ["grp"], "ck")
    merged = sd.merge_set_digest(per.select(F.lit(1).alias("one"), "digest"), ["one"])
    direct = sd.make_set_digest(
        members.select(F.lit(1).alias("one"), "ck"), ["one"], "ck"
    )
    m = merged.select("digest").collect()[0].digest
    d = direct.select("digest").collect()[0].digest
    assert list(m.mh) == list(d.mh)
    m_est = merged.select(sd.cardinality("digest").alias("c")).collect()[0].c
    d_est = direct.select(sd.cardinality("digest").alias("c")).collect()[0].c
    assert abs(m_est - d_est) / d_est < 0.02


def test_bottom_k_is_exact_small_sets(spark):
    # sets smaller than k -> digests hold every hash -> jaccard is EXACT
    a = set(range(0, 300))
    b = set(range(100, 400))
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "grp string, v long"
    )
    per = sd.make_set_digest(df, ["grp"], "v")
    ref = F.broadcast(per.filter(F.col("grp") == "a").select(F.col("digest").alias("ref")))
    j = (
        per.filter(F.col("grp") == "b")
        .crossJoin(ref)
        .select(sd.jaccard_index("digest", "ref").alias("j"))
        .collect()[0]
        .j
    )
    exact = len(a & b) / len(a | b)
    assert abs(j - exact) < 1e-9


def test_prefilter_equals_unfiltered(members):
    # the hash-threshold pre-filter must not change the digest: a huge
    # safety factor forces thr = 2^62 (keep-all), which is the unfiltered
    # build; the default safety=4 build must produce the identical minhash
    per_f = sd.make_set_digest(members, ["grp"], "ck")
    per_all = sd.make_set_digest(members, ["grp"], "ck", safety=10**9)
    f = {r.grp: list(r.digest.mh) for r in per_f.collect()}
    a = {r.grp: list(r.digest.mh) for r in per_all.collect()}
    assert f == a
