"""Ground-truth checks for the sketch aggregates that have no cross-engine
oracle (engine-specific HLL++/KLL layouts) — asserts error bounds against
the exact values computed in the same row."""

from trino_spark.queries import all_specs


def test_approx_family_error_bounds(spark, sf_dir):
    rows = all_specs()["agg_approx_family"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # approx_count_distinct at rsd=0.02: allow 5x the nominal bound.
        assert abs(r.approx_orders - r.exact_orders) <= max(0.10 * r.exact_orders, 2), r
        # percentile_approx with accuracy=10000 on ~60k rows: near-exact.
        assert abs(r.approx_p50 - r.exact_p50) <= 0.01 * max(abs(r.exact_p50), 1), r
        assert r.approx_p90 >= r.approx_p50, r


def test_groups_frame_covers_all_rows(spark, sf_dir):
    df = all_specs()["window_groups_frame"].build(spark, sf_dir)
    n_in = (
        all_specs()["window_groups_frame"]
        .build(spark, sf_dir)
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert df.count() == n_in  # frame emulation must not drop or duplicate rows


def test_hll_sketch_union_error_bounds(spark, sf_dir):
    rows = all_specs()["sketch_hll_union"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    total_exact = sum(r.exact for r in rows)  # priorities partition customers? no — union bounds below
    for r in rows:
        assert abs(r.est - r.exact) <= max(0.05 * r.exact, 2), r
        # merged estimate cannot exceed the sum and must cover the max group
        assert r.est_total <= total_exact * 1.05
        assert r.est_total >= max(x.exact for x in rows) * 0.95
