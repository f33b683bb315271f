"""Plan-shape pins for the TPC-DS corpus — the scale-survival guarantees
for the multi-CTE monster queries (q4/q11/q14/q23/q64/q74/q78).

The vendored SQL is pure equi-join; if the dialect translation ever drops
a join condition (alias mix-up, quoted-identifier slip), Catalyst falls
back to a cartesian product — correct at sf0.001, catastrophic at 100 TB.
These pins make that failure mode a test failure instead of a cluster
incident. (Reference analog: the golden plan tests of
testing/trino-tests/.../TestPartitionedTpcdsCostBasedPlan.java.)
"""

from trino_spark.queries import all_specs

MONSTERS = ["tpcds_q04", "tpcds_q11", "tpcds_q14a", "tpcds_q23a", "tpcds_q64", "tpcds_q74", "tpcds_q78"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_monster_queries_have_no_cartesian_joins(spark, sf_dir):
    for name in MONSTERS:
        plan = _plan(all_specs()[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q77_cartesian_is_single_and_scalar(spark, sf_dir):
    # q77's `cr` CTE cross-joins a ONE-ROW global aggregate to per-center
    # rows (the reference query's own shape) — benign at any scale. Pin
    # that it stays the only non-equi join in the plan.
    plan = _plan(all_specs()["tpcds_q77"].build(spark, sf_dir))
    loops = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
    assert loops <= 1


def test_q64_broadcasts_dimensions(spark, sf_dir):
    # date_dim/item/store are dimension tables; the 2-year self-joined
    # fact pipeline must probe them broadcast, not shuffle them.
    plan = _plan(all_specs()["tpcds_q64"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q42_date_filter_pushed_to_scan(spark, sf_dir):
    # d_moy/d_year literals must reach the date_dim parquet reader.
    plan = _plan(all_specs()["tpcds_q42"].build(spark, sf_dir))
    pushed = [
        seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("d_moy" in p or "d_year" in p for p in pushed)


def test_unpartitioned_windows_ride_post_aggregation_inputs(spark, sf_dir):
    """q44/q49 carry spec-mandated `rank() OVER (ORDER BY ...)` with no
    PARTITION BY (TPC-DS specification text). Pin that every Window node
    in their physical plans consumes a post-aggregation input — an
    aggregate appears in the window's subtree before any file scan — so
    the single-partition window is bounded by grouped-row cardinality,
    not fact-table volume, and a future window-over-raw-scan fails here
    instead of hiding in the bench tail's 'WindowExec: No Partition
    Defined' noise."""
    import re

    for name in ("tpcds_q44", "tpcds_q49"):
        plan = _plan(all_specs()[name].build(spark, sf_dir))
        lines = plan.split("\n")
        windows = [i for i, ln in enumerate(lines) if re.search(r"\bWindow\b", ln)]
        assert windows, name  # the spec queries do carry windows
        for wi in windows:
            indent = len(lines[wi]) - len(lines[wi].lstrip(" :+-|"))
            agg_first = None
            for ln in lines[wi + 1 :]:
                d = len(ln) - len(ln.lstrip(" :+-|"))
                if ln.strip() and d <= indent:
                    break  # left the window's subtree
                body = ln.lstrip(" :+-|")
                if re.match(r"(Hash|Sort|ObjectHash)Aggregate", body):
                    agg_first = True
                    break
                if re.match(r"(FileScan|Scan |BatchScan)", body):
                    agg_first = False
                    break
            assert agg_first, f"{name}: Window consumes a raw scan\n{lines[wi]}"
