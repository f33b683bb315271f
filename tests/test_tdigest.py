"""t-digest sketch tests (TDigestFunctions.java parity contract: bounded
rank error, tail-accurate, arbitrarily mergeable)."""

import numpy as np
import pandas as pd
import pytest

from trino_spark.operators import tdigest as td


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    """|empirical rank of estimate - q|."""
    return abs((values <= est).mean() - q)


class TestCore:
    def test_compress_bounds_centroids(self):
        rng = np.random.RandomState(7)
        v = rng.lognormal(0, 2, 50_000)
        m, w = td.compress(v, np.ones_like(v), delta=100)
        assert len(m) <= 200  # k1 bound ~ delta
        assert w.sum() == pytest.approx(50_000)
        assert (np.diff(m) >= 0).all()

    @pytest.mark.parametrize("q", [0.01, 0.1, 0.5, 0.9, 0.99, 0.999])
    def test_rank_accuracy(self, q):
        rng = np.random.RandomState(11)
        v = rng.exponential(5.0, 100_000)
        m, w = td.compress(v, np.ones_like(v), delta=100)
        est = td.quantile(m, w, q)
        # t-digest contract: rank error shrinks toward the tails; 1% is a
        # loose global bound for delta=100
        assert _rank_error(v, est, q) < 0.01, q

    def test_merge_equivalence(self):
        rng = np.random.RandomState(3)
        a = rng.normal(100, 15, 40_000)
        b = rng.normal(60, 5, 60_000)
        full = np.concatenate([a, b])
        ma, wa = td.compress(a, np.ones_like(a), 100)
        mb, wb = td.compress(b, np.ones_like(b), 100)
        mm, wm = td.compress(np.concatenate([ma, mb]), np.concatenate([wa, wb]), 100)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            merged = td.quantile(mm, wm, q)
            assert _rank_error(full, merged, q) < 0.015, q

    def test_empty_and_singleton(self):
        m, w = td.compress(np.array([]), np.array([]), 100)
        assert len(m) == 0 and np.isnan(td.quantile(m, w, 0.5))
        m, w = td.compress(np.array([42.0]), np.array([1.0]), 100)
        assert td.quantile(m, w, 0.5) == 42.0


class TestSpark:
    def test_agg_and_quantiles(self, spark, sf_dir):
        from trino_spark.queries.base import t

        li = t(spark, sf_dir, "lineitem")
        digests = td.tdigest_agg(li, ["l_returnflag"], "l_extendedprice")
        out = td.with_quantiles(digests, [0.5, 0.9, 0.99], ["l_returnflag"])
        rows = {r.l_returnflag: r for r in out.collect()}
        exact = {
            r.l_returnflag: r
            for r in li.groupBy("l_returnflag")
            .agg(
                *[
                    __import__("pyspark.sql.functions", fromlist=["F"]).expr(
                        f"percentile(l_extendedprice, {q})"
                    ).alias(f"e{i}")
                    for i, q in enumerate([0.5, 0.9, 0.99])
                ]
            )
            .collect()
        }
        for k, r in rows.items():
            e = exact[k]
            # value tolerance derived from rank tolerance on this data:
            # allow 2% relative at these quantiles
            assert abs(r.q0_5 - e.e0) / e.e0 < 0.02
            assert abs(r.q0_9 - e.e1) / e.e1 < 0.02
            assert abs(r.q0_99 - e.e2) / e.e2 < 0.02

    def test_stored_digests_merge(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from trino_spark.queries.base import t

        li = t(spark, sf_dir, "lineitem")
        # build digests per (flag, linestatus), then merge down to flag —
        # the stored-column merge workflow
        fine = td.tdigest_agg(li, ["l_returnflag", "l_linestatus"], "l_extendedprice")
        merged = td.merge_digests(fine.drop("l_linestatus"), ["l_returnflag"])
        direct = td.tdigest_agg(li, ["l_returnflag"], "l_extendedprice")
        qm = td.with_quantiles(merged, [0.5], ["l_returnflag"])
        qd = td.with_quantiles(direct, [0.5], ["l_returnflag"])
        j = qm.join(qd.withColumnRenamed("q0_5", "q_direct"), "l_returnflag")
        for r in j.collect():
            assert abs(r.q0_5 - r.q_direct) / r.q_direct < 0.01
