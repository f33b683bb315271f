"""JSON_TABLE — SQL/JSON-2016 table function (lax-path subset).

Reference: main/operator/table/json/ (JsonTable PTF machinery),
grammar SqlBase.g4 JSON_TABLE clause, JsonPath.g4. Trino plans JSON_TABLE
as a polymorphic table function producing one relational row per item the
row-path selects. Spark-first formulation: the row path runs as
`get_json_object` (JVM Jackson), items explode via `from_json(...,
'array<string>')` — which keeps each array element as raw JSON text, so
column paths evaluate per item with `get_json_object` and a cast. The
whole pipeline is native expressions; a billion-document column never
leaves the JVM.

Supported subset: lax paths ('lax $.a.b[*]' / '$'), scalar COLUMNS with
PATH + type, FOR ORDINALITY, OUTER (keep rows whose row path is empty) —
the shapes Trino's docs use. NESTED PATH and strict-mode errors are out of
scope (documented)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnSpec:
    """One COLUMNS entry: name type PATH 'lax $.x' | name FOR ORDINALITY."""

    name: str
    dtype: str = "string"
    path: str | None = None  # default: 'lax $.<name>'
    ordinality: bool = False


def _strip_mode(path: str) -> str:
    p = path.strip()
    for mode in ("lax", "strict"):
        if p.lower().startswith(mode + " "):
            p = p[len(mode) + 1 :].strip()
    return p


def json_table(
    df: DataFrame,
    json_col: str,
    row_path: str,
    columns: list[ColumnSpec],
    outer: bool = False,
) -> DataFrame:
    """Flatten a JSON-text column into relational rows.

    Each item matched by `row_path` (which must select an array, or `$`
    for a root array) becomes one output row carrying the source row's
    other columns plus the COLUMNS projections."""
    rp = _strip_mode(row_path)
    if rp.endswith("[*]"):
        rp = rp[:-3]
    arr_text = F.col(json_col) if rp == "$" else F.get_json_object(F.col(json_col), rp)
    items = F.from_json(arr_text, "array<string>")

    explode = F.posexplode_outer if outer else F.posexplode
    base = [c for c in df.columns]
    exploded = df.select(*base, explode(items).alias("_ord0", "_item"))

    projections = []
    for c in columns:
        if c.ordinality:
            projections.append((F.col("_ord0") + 1).cast("long").alias(c.name))
        else:
            path = _strip_mode(c.path) if c.path else f"$.{c.name}"
            projections.append(
                F.get_json_object(F.col("_item"), path).cast(c.dtype).alias(c.name)
            )
    return exploded.select(*base, *projections)
