"""Apache DataSketches Theta interop (docs/functions/datasketches.md;
functions/thetasketch.py — public compact layout serVer 3 / family 3).

No DataSketches library exists in this container, so the pins are:
byte-level preamble invariants per the published layout table, exact-
mode estimates equal to true counts, estimation-mode error inside the
published 1/sqrt(k) bounds, union identities, and full-mode
parse/serialize round-trips. The module docstring states this
verification split explicitly."""

import struct

import pytest

from trino_spark.functions import thetasketch as T


class TestLayout:
    def test_empty_preamble(self):
        b = T.build([])
        assert b[0] == 1 and b[1] == 3 and b[2] == 3  # preLongs/serVer/family
        assert b[5] & 0x04  # EMPTY flag
        assert len(b) == 8

    def test_single_item_preamble(self):
        b = T.build(["x"])
        assert b[0] == 1 and b[5] & 0x20 and len(b) == 16  # SINGLE flag

    def test_exact_mode_preamble(self):
        b = T.build(range(100))
        assert b[0] == 2 and not (b[5] & 0x04)
        count = struct.unpack_from("<I", b, 8)[0]
        assert count == 100 and len(b) == 16 + 8 * 100

    def test_estimation_mode_preamble(self):
        b = T.build(range(100000), nominal_entries=256)
        assert b[0] == 3
        count = struct.unpack_from("<I", b, 8)[0]
        theta = struct.unpack_from("<q", b, 16)[0]
        assert count == 256 and 0 < theta < (1 << 63) - 1
        # ORDERED flag means ascending entries
        entries = struct.unpack_from("<256q", b, 24)
        assert list(entries) == sorted(entries)

    def test_roundtrip_all_modes(self):
        for sk in (T.build([]), T.build([7]), T.build(range(50)),
                   T.build(range(50000), nominal_entries=128)):
            t, e, sh = T.parse(sk)
            assert T.parse(T.serialize(t, e, sh)) == (t, e, sh)


class TestEstimates:
    def test_exact_mode_is_exact(self):
        assert T.estimate(T.build(range(4000))) == 4000.0
        assert T.estimate(T.build([])) == 0.0
        assert T.estimate(T.build(["a", "b", "a"])) == 2.0

    def test_estimation_error_within_bounds(self):
        for k, n in ((256, 50000), (1024, 200000), (4096, 100000)):
            est = T.estimate(T.build(range(n), nominal_entries=k))
            rse = 1.0 / (k ** 0.5)
            assert abs(est - n) / n < 4 * rse, (k, n, est)

    def test_union_identity(self):
        a = T.build(range(0, 60000), nominal_entries=4096)
        b = T.build(range(30000, 90000), nominal_entries=4096)
        eu = T.estimate(T.union([a, b]))
        assert abs(eu - 90000) / 90000 < 0.07
        # union with empty is identity
        assert T.parse(T.union([a, T.build([])])) == T.parse(T.union([a]))

    def test_seed_mismatch_raises(self):
        with pytest.raises(ValueError, match="seed"):
            T.parse(T.build([1, 2], seed=777), seed=T.DEFAULT_SEED)
        with pytest.raises(ValueError, match="different seeds"):
            T.union([T.build([1], seed=777), T.build([2])])


class TestSqlSurface:
    def test_group_build_union_estimate(self, spark):
        from trino_spark.dialect.engine import TrinoEngine

        eng = TrinoEngine(spark)
        est = eng.sql(
            "WITH g AS (SELECT id % 4 AS grp, theta_sketch_agg(CAST(id AS BIGINT)) AS sk"
            " FROM (SELECT explode(sequence(0, 9999)) AS id) GROUP BY id % 4)"
            " SELECT theta_sketch_cardinality(theta_sketch_union(sk)) AS est FROM g"
        ).collect()[0].est
        # 10000 distinct > k=4096: estimation mode, published bound applies
        assert abs(est - 10000) / 10000 < 4 / (4096 ** 0.5)
        exact = eng.sql(
            "SELECT theta_sketch_cardinality(theta_sketch_agg(v)) AS e"
            " FROM (SELECT explode(array('a','b','c','a')) AS v)"
        ).collect()[0].e
        assert exact == 3.0
