"""information_schema views + SHOW statement support.

The reference rewrites SHOW TABLES/COLUMNS/SCHEMAS into SELECTs over
information_schema before planning (core/trino-main/.../sql/rewrite/
ShowQueriesRewrite.java; the schema itself is served by
main/connector/informationschema/InformationSchemaMetadata.java). Same
approach here: two temp views built from the engine catalog, plus a
SHOW → SELECT rewrite used by TrinoEngine.sql.
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession


def register_information_schema(spark: SparkSession, tables: dict[str, list[tuple[str, str]]]) -> None:
    """tables: name -> [(column_name, data_type)]."""
    trows = [
        Row(table_catalog="spark", table_schema="default", table_name=t, table_type="BASE TABLE")
        for t in sorted(tables)
    ]
    crows = [
        Row(
            table_catalog="spark",
            table_schema="default",
            table_name=t,
            column_name=c,
            ordinal_position=i + 1,
            data_type=dt,
        )
        for t, cols in sorted(tables.items())
        for i, (c, dt) in enumerate(cols)
    ]
    spark.createDataFrame(trows).createOrReplaceTempView("information_schema_tables")
    spark.createDataFrame(crows).createOrReplaceTempView("information_schema_columns")


def rewrite_show(sql: str) -> str | None:
    """SHOW TABLES / SHOW COLUMNS FROM t / SHOW SCHEMAS → SELECTs.
    Returns None when `sql` is not a SHOW statement."""
    words = sql.strip().rstrip(";").split()
    if not words or words[0].upper() != "SHOW":
        return None
    kind = words[1].upper() if len(words) > 1 else ""
    if kind == "TABLES":
        return "SELECT table_name FROM information_schema_tables ORDER BY table_name"
    if kind == "SCHEMAS":
        return "SELECT DISTINCT table_schema AS schema_name FROM information_schema_tables"
    if kind == "COLUMNS" and len(words) >= 4 and words[2].upper() in ("FROM", "IN"):
        t = words[3].strip('"')
        return (
            "SELECT column_name, data_type, ordinal_position "
            f"FROM information_schema_columns WHERE table_name = '{t}' "
            "ORDER BY ordinal_position"
        )
    return None
