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
PATH + type, FOR ORDINALITY, OUTER (keep rows whose row path is empty),
and NESTED PATH (one nested spec per level, any depth, PLAIN LEFT OUTER
join semantics — parent rows survive an empty child array). Sibling
NESTED specs and strict-mode errors are out of scope (documented)."""

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


@dataclass(frozen=True)
class NestedSpec:
    """NESTED PATH 'lax $.x[*]' COLUMNS (...) — child rows laterally
    joined to their parent item (JsonTable nested plan in the reference;
    grammar SqlBase.g4 jsonTableColumn -> NESTED)."""

    path: str
    columns: tuple = ()


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
    return _project_level(exploded, base, "_item", "_ord0", columns, depth=0)


def _project_level(df: DataFrame, base: list, item_col: str, ord_col: str, columns, depth: int) -> DataFrame:
    """Project one COLUMNS level; recurse into at most one NestedSpec
    (child array explodes posexplode_outer — PLAIN LEFT OUTER: a parent
    item with no child rows still emits one row with NULL child cols)."""
    projections, nested = [], None
    for c in columns:
        if isinstance(c, NestedSpec):
            if nested is not None:
                raise ValueError("JSON_TABLE: one NESTED PATH per level supported")
            nested = c
            continue
        if c.ordinality:
            projections.append((F.col(ord_col) + 1).cast("long").alias(c.name))
        else:
            path = _strip_mode(c.path) if c.path else f"$.{c.name}"
            projections.append(
                F.get_json_object(F.col(item_col), path).cast(c.dtype).alias(c.name)
            )
    if nested is None:
        return df.select(*base, *projections)
    npath = _strip_mode(nested.path)
    if npath.endswith("[*]"):
        npath = npath[:-3]
    child_arr = F.from_json(F.get_json_object(F.col(item_col), npath), "array<string>")
    scalar_names = [p for p in projections]
    child_item, child_ord = f"_item{depth + 1}", f"_ord{depth + 1}"
    widened = df.select(
        *base, *scalar_names, F.posexplode_outer(child_arr).alias(child_ord, child_item)
    )
    new_base = base + [c.name for c in columns if not isinstance(c, NestedSpec)]
    return _project_level(widened, new_base, child_item, child_ord, nested.columns, depth + 1)
