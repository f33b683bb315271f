"""SQL MERGE as a join+union rewrite (no storage-format dependency).

Trino executes MERGE by routing row changes through MergeWriterOperator /
MergeProcessorOperator with a connector RowChangeParadigm (reference:
core/trino-main/src/main/java/io/trino/operator/MergeWriterOperator.java:48,
MergeProcessorOperator.java, DeleteAndInsertMergeProcessor.java; grammar
core/trino-grammar/.../SqlBase.g4:220). On Spark without a transactional
table format the equivalent is computing the post-merge relation: one
full-outer equi-join target↔source on the merge keys, then per-row case
routing (update / delete / keep / insert). `df.write` of the result is the
commit (or Delta `MERGE INTO` where available — same plan shape).

Scale notes: exactly one shuffle (the join on merge keys); when the change
set is small relative to the target, pass broadcast_source=True to skip
even that. Matched/not-matched routing is pure projection — no second pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_set: dict[str, Column] | None = None,
    delete_condition: Column | None = None,
    insert_values: dict[str, Column] | None = None,
    broadcast_source: bool = False,
    count_into=None,
    update_touch_condition: Column | None = None,
) -> DataFrame:
    """Compute the post-MERGE state of `target`.

    WHEN MATCHED AND delete_condition  THEN DELETE
    WHEN MATCHED                       THEN UPDATE SET update_set
    WHEN NOT MATCHED [BY TARGET]       THEN INSERT insert_values
    (rows only in target are kept unchanged)

    `update_set` / `insert_values` columns reference source columns as
    `s_<name>` and target columns by their own name. Column order of the
    result matches `target`.

    `count_into` (a pyspark Observation) rides the join with the
    TableFinish affected-row count (TableFinishOperator.java:55): rows a
    clause actually touched — deleted, updated (narrowed by
    `update_touch_condition` when the UPDATE clause was conditional), or
    inserted. Matched rows no clause touched do NOT count. The metrics
    materialize with whatever action the caller runs on the result — no
    extra counting scan.
    """
    tcols = target.columns
    src = source
    for c in src.columns:
        src = src.withColumnRenamed(c, f"s_{c}")
    if broadcast_source:
        src = F.broadcast(src)

    cond = None
    for k in keys:
        piece = target[k] == src[f"s_{k}"]
        cond = piece if cond is None else cond & piece
    joined = target.join(src, cond, "full_outer")

    matched = src[f"s_{keys[0]}"].isNotNull() & target[keys[0]].isNotNull()
    source_only = target[keys[0]].isNull()

    if count_into is not None:
        del_c = (
            F.coalesce(delete_condition, F.lit(False))
            if delete_condition is not None
            else F.lit(False)
        )
        if update_set is not None:
            upd_c = (
                F.coalesce(update_touch_condition, F.lit(False))
                if update_touch_condition is not None
                else F.lit(True)
            )
        else:
            upd_c = F.lit(False)
        joined = joined.observe(
            count_into,
            F.sum((matched & (del_c | upd_c)).cast("long")).alias("touched"),
            F.sum((source_only & F.lit(insert_values is not None)).cast("long")).alias(
                "inserted"
            ),
        )

    out_cols = []
    for c in tcols:
        col = F.col(c)
        if update_set and c in update_set:
            col = F.when(matched, update_set[c]).otherwise(col)
        if insert_values is not None:
            ins = insert_values.get(c, F.lit(None))
            col = F.when(source_only, ins).otherwise(col)
        out_cols.append(col.alias(c))

    keep = ~matched | F.lit(delete_condition is None)
    if delete_condition is not None:
        keep = ~matched | ~delete_condition
    if insert_values is None:
        keep = keep & ~source_only

    return joined.filter(keep).select(*out_cols)
