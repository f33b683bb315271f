"""Polymorphic table functions backed by Spark Python UDTFs.

Trino's PTF SPI (spi/function/table/ConnectorTableFunction.java and the
built-ins under main/operator/table/) lets a function return a relation.
Spark 4's Python UDTF is the native analog: a class with `eval(...)`
yielding rows, registered under a name and invoked directly in FROM
position — including `TABLE(...)` relation arguments, the same calling
convention Trino's grammar uses (SqlBase.g4 tableFunctionCall).

The dialect layer bridges the syntax: `FROM TABLE(fn(args))` translates to
`FROM fn(args)` (rewrites._rewrite_table_ptf), with `sequence` and
`exclude_columns` special-cased into pure-SQL plans (no Python). UDTFs
run in Python workers — the slow path by design, exactly like Trino PTFs
being plugin code: use them for logic the relational operators can't
express, not for bulk transforms.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class SplitToRows:
    """split_to_rows(text, delim): one row per delimited part with its
    1-based ordinal — the classic PTF demo shape (cf. Trino's table
    function docs' EXCLUDE_COLUMNS/SEQUENCE built-ins; an ordinal-emitting
    splitter is the smallest useful custom PTF)."""

    def eval(self, text: str, delim: str):  # noqa: D102 (UDTF contract)
        if text is None or delim is None or delim == "":
            return
        for i, part in enumerate(text.split(delim)):
            yield (i + 1, part)


SPLIT_TO_ROWS_SCHEMA = "ordinal: int, value: string"


def register_builtin_table_functions(spark: SparkSession) -> None:
    """Register the built-in Python UDTF PTFs on this session."""
    register_table_function(spark, "split_to_rows", SplitToRows, SPLIT_TO_ROWS_SCHEMA)


def register_table_function(
    spark: SparkSession, name: str, handler: type, return_type: str
) -> None:
    """Register a Python class as a named PTF callable from SQL.

    `handler` follows Spark's UDTF contract: an `eval(self, *args)` that
    yields tuples matching `return_type` (optionally `terminate`)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(name, udtf(handler, returnType=return_type))
