"""DuckDB-differential test harness.

Mirrors Trino's H2-differential QueryAssertions (reference:
testing/trino-testing/src/main/java/io/trino/testing/QueryAssertions.java:154
and H2QueryRunner.java): every engine query result is compared against a
reference DB running equivalent SQL over the same data. Our reference DB is
DuckDB over the same parquet files (FIXTURES.md harness conventions):
canonical ordering, approx-equality (rel 1e-9) on floats, exact elsewhere.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pandas as pd

from trino_spark.catalog import ALL_TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-12


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the ten testdata tables registered as views, matching
    the driver's pre-registered view contract."""
    con = duckdb.connect()
    for name in ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written table directory (e.g. the sf1 scaling set):
            # DuckDB needs a part-file glob, not the directory itself
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    """Canonicalize a cell for ordering/compare across engines."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None  # treat NaN like NULL for ordering; compared via _cells_equal
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def _frame_to_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for rec in df[cols].itertuples(index=False, name=None):
        canon = tuple(_canon_cell(v) for v in rec)
        canon = tuple(None if isinstance(v, float) and pd.isna(v) else v for v in canon)
        out.append(canon)
    out.sort(key=_sort_key)
    return out


def assert_same_results(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    """Column-name-sorted, order-insensitive, float-tolerant equality."""
    actual_pdf = spark_df.toPandas()
    a_cols, o_cols = sorted(actual_pdf.columns), sorted(oracle_pdf.columns)
    assert a_cols == o_cols, f"{name}: column mismatch spark={a_cols} oracle={o_cols}"
    actual = _frame_to_rows(actual_pdf)
    expect = _frame_to_rows(oracle_pdf)
    assert len(actual) == len(expect), f"{name}: row count spark={len(actual)} oracle={len(expect)}"
    for i, (ra, re_) in enumerate(zip(actual, expect)):
        ok = len(ra) == len(re_) and all(_cells_equal(x, y) for x, y in zip(ra, re_))
        assert ok, f"{name}: row {i} differs\n  spark : {ra}\n  oracle: {re_}"


def run_differential(spark, con: duckdb.DuckDBPyConnection, spec, sf_dir: str) -> None:
    spark_df = spec.build(spark, sf_dir)
    oracle_pdf = con.execute(spec.oracle).fetch_df()
    assert_same_results(spark_df, oracle_pdf, name=spec.name)
