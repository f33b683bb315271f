"""Faker generator source tests (sources/faker.py, plugin/trino-faker
analog): determinism, typed output, name-hint generators, plan shape."""

import pytest

from trino_spark.sources import faker

_SCHEMA = "user_id bigint, full_name string, email string, signup_ts timestamp, score double, active boolean"


def test_deterministic_and_typed(spark):
    a = faker.gen(spark, _SCHEMA, 50, seed=7).collect()
    b = faker.gen(spark, _SCHEMA, 50, seed=7).collect()
    assert a == b
    assert len(a) == 50
    r = a[0]
    assert isinstance(r.user_id, int) and isinstance(r.score, float)


def test_seed_changes_data(spark):
    a = faker.gen(spark, "x bigint", 20, seed=1).collect()
    b = faker.gen(spark, "x bigint", 20, seed=2).collect()
    assert a != b


def test_name_hints(spark):
    rows = faker.gen(spark, _SCHEMA, 30, seed=3).collect()
    assert all("@" in r.email for r in rows)
    assert all(" " in r.full_name for r in rows)


def test_timestamp_window(spark):
    import datetime

    rows = faker.gen(spark, "ts timestamp", 100, seed=5).collect()
    assert all(datetime.datetime(2020, 1, 1) <= r.ts <= datetime.datetime(2025, 1, 2) for r in rows)


def test_embedding_array(spark):
    rows = faker.gen(spark, "embedding array<float>", 5, seed=9).collect()
    assert all(len(r.embedding) == 8 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.embedding)


def test_unsupported_type_rejected(spark):
    with pytest.raises(ValueError, match="unsupported type"):
        faker.gen(spark, "m map<string,string>", 3)


def test_no_shuffle_plan(spark):
    df = faker.gen(spark, _SCHEMA, 1000, seed=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_blackhole_sink_executes(spark):
    from trino_spark import writes

    writes.blackhole(faker.gen(spark, "x bigint", 100))
