"""Dialect DML: CREATE TABLE AS / INSERT / DELETE / UPDATE / MERGE / TRUNCATE
/ DROP executed through ``TrinoEngine.sql``.

Role-equivalent to the reference's DML entry point C (SURVEY.md §3.3):
TableWriterOperator -> TableFinishOperator for CTAS/INSERT
(core/trino-main/.../operator/TableWriterOperator.java:69), MergeWriter /
MergeProcessor for MERGE (MergeWriterOperator.java:48), and the
metadata-delete path (TableMutationOperator.java). Trino routes row changes
through a connector RowChangeParadigm; without a transactional table format
the Spark-first equivalent is **copy-on-write**: compute the post-change
relation declaratively (filter / CASE projection / full-outer merge join —
all Catalyst-optimized), write it to a staging directory, and atomically
swap directories (the same commit model Hive-style non-ACID connectors use
in the reference: delete+insert rewrite of affected data).

Managed tables live under ``spark-warehouse/dml/<name>``. Mutating a
registered read-only source (the driver's testdata parquet) raises, exactly
like Trino's "This connector does not support updates" (reference:
io.trino.spi.connector.ConnectorMetadata default methods).

Scale notes: each statement is one Spark job over the table — DELETE/UPDATE
are scan+filter/scan+project (whole-stage codegen, no shuffle), MERGE is the
single full-outer equi-join of operators/merge.py. The affected-row count
(Trino's TableFinish output) is taken from the written parquet footers'
row counts, not a second scan of the data.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F

from trino_spark.operators.merge import merge_into

_IDENT = r'[A-Za-z_][\w$]*|"[^"]+"'


def _norm_name(name: str) -> str:
    return name.strip().strip('"').split(".")[-1].lower()


def _warehouse_dir() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, "spark-warehouse", "dml")


def try_execute(engine, sql: str) -> DataFrame | None:
    """Execute `sql` if it is a DML statement; return None otherwise.

    Returns a one-row ``rows: bigint`` DataFrame (the reference's
    TableFinishOperator rowcount result, TableFinishOperator.java:55).
    """
    stripped = sql.strip().rstrip(";")
    up = stripped.upper().split()
    if up[:2] == ["CREATE", "TABLE"] and " AS " in f" {stripped.upper()} ":
        return _ctas(engine, stripped)
    if up[:2] == ["DROP", "TABLE"]:
        return _drop(engine, stripped)
    if up[:2] == ["TRUNCATE", "TABLE"]:
        return _truncate(engine, stripped)
    if up[:2] == ["INSERT", "INTO"]:
        return _insert(engine, stripped)
    if up[:2] == ["DELETE", "FROM"]:
        return _delete(engine, stripped)
    if up[:1] == ["UPDATE"] and "SET" in up:
        return _update(engine, stripped)
    if up[:2] == ["MERGE", "INTO"]:
        return _merge(engine, stripped)
    return None


# ---------------------------------------------------------------- storage


def _managed(engine) -> dict[str, str]:
    if not hasattr(engine, "dml_tables"):
        engine.dml_tables = {}
    return engine.dml_tables


def _require_managed(engine, name: str) -> str:
    tables = _managed(engine)
    if name not in tables:
        # The reference raises MODIFYING_ROWS_NOT_SUPPORTED for connectors
        # without a RowChangeParadigm; our testdata parquet is read-only.
        raise ValueError(
            f"table '{name}' is not a managed (engine-created) table: "
            "this source does not support updates"
        )
    return tables[name]


def _written_rows(path: str) -> int:
    """Row count from parquet footers — the commit's own metadata, no
    second scan (TableFinishOperator gets the count from writer stats)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def _commit(engine, name: str, df: DataFrame, partition_by: list[str] | None = None) -> int:
    """Copy-on-write commit: stage-write the post-change relation, swap the
    table directory, re-register the view. Returns rows in the new state.
    `partition_by` produces a hive-style layout (downstream scans get
    static partition pruning + DPP); mutations preserve the layout."""
    txn_snapshot_if_needed(engine, name)
    path = os.path.join(_warehouse_dir(), name)
    # Janitor: a crashed earlier run can leave .staging-*/.old-* dirs for
    # this table; concurrent runners use per-process table names, so any
    # leftover here is garbage.
    parent = os.path.dirname(path)
    if os.path.isdir(parent):
        base = os.path.basename(path)
        for d in os.listdir(parent):
            if d.startswith((f"{base}.staging-", f"{base}.old-")):
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    layouts = getattr(engine, "_dml_layouts", None)
    if layouts is None:
        layouts = engine._dml_layouts = {}
    if partition_by is not None:
        layouts[name] = partition_by
    part_cols = layouts.get(name)
    w = df.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(staging)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    _managed(engine)[name] = path
    stored = engine.spark.read.parquet(path)
    stored.createOrReplaceTempView(name)
    refresh_infoschema(engine, changed=name)
    return _written_rows(path)


def _read(engine, name: str) -> DataFrame:
    return engine.spark.read.parquet(_require_managed(engine, name))


def _translate_fragment(engine, text: str) -> str:
    """Run a predicate/expression fragment through the dialect translator
    (function renames, || handling, AT TIME ZONE, ...)."""
    from trino_spark.dialect.rewrites import translate

    from trino_spark.dialect import routines as _routines_mod

    return translate(_routines_mod.expand(text, engine.routines))


# ---------------------------------------------------------------- statements


def _ctas(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?({_IDENT}(?:\.{_IDENT})*)\s*"
        rf"(WITH\s*\(.*?\)\s*)?AS\s+(.*)$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse CTAS: {sql[:120]}")
    name = _norm_name(m.group(1))
    if_not_exists = re.search(r"IF\s+NOT\s+EXISTS", sql[: m.start(3)], re.IGNORECASE)
    if name in _managed(engine) and if_not_exists:
        return engine.spark.createDataFrame([(0,)], "rows: bigint")
    partition_by = _parse_with_props(m.group(2))
    df = engine.sql(m.group(3))
    n = _commit(engine, name, df, partition_by=partition_by)
    return engine.spark.createDataFrame([(n,)], "rows: bigint")


def _parse_with_props(with_txt: str | None) -> list[str] | None:
    """CTAS WITH (...) table properties (reference: HiveTableProperties /
    connector table property metadata): `partitioned_by = ARRAY['c', ...]`
    produces a hive-layout partitioned write; `format = 'PARQUET'` is
    accepted (parquet is the only storage here — any other format raises
    rather than silently writing parquet)."""
    if not with_txt:
        return None
    fm = re.search(r"format\s*=\s*'(\w+)'", with_txt, re.IGNORECASE)
    if fm and fm.group(1).upper() != "PARQUET":
        raise ValueError(f"CTAS WITH format = '{fm.group(1)}' not supported (parquet only)")
    pm = re.search(r"partitioned_by\s*=\s*ARRAY\s*\[([^\]]*)\]", with_txt, re.IGNORECASE)
    if pm:
        cols = [c.strip().strip("'\"") for c in pm.group(1).split(",") if c.strip()]
        return cols or None
    known = re.sub(r"(format|partitioned_by)\s*=", "", with_txt, flags=re.IGNORECASE)
    if "=" in known:
        raise ValueError(f"unsupported CTAS table property in: {with_txt.strip()[:60]}")
    return None


def _drop(engine, sql: str) -> DataFrame:
    parts = sql.split()
    idx = 4 if len(parts) > 4 and parts[2].upper() == "IF" else 2
    name = _norm_name(parts[idx])
    if name in _managed(engine):
        txn_snapshot_if_needed(engine, name)
    path = _managed(engine).pop(name, None)
    if path:
        shutil.rmtree(path, ignore_errors=True)
        engine.spark.catalog.dropTempView(name)
        refresh_infoschema(engine, dropped=name)
    elif engine.spark.catalog.tableExists(name):
        # A saveAsTable-managed (e.g. bucketed-CTAS) catalog table.
        engine.spark.sql(f"DROP TABLE {name}")
    elif idx == 2:
        raise ValueError(f"table not found: {name}")
    return engine.spark.createDataFrame([(0,)], "rows: bigint")


def _truncate(engine, sql: str) -> DataFrame:
    name = _norm_name(sql.split()[2])
    df = _read(engine, name)
    _commit(engine, name, df.limit(0))
    return engine.spark.createDataFrame([(0,)], "rows: bigint")


def _insert(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"INSERT\s+INTO\s+({_IDENT}(?:\.{_IDENT})*)\s*(\([^)]*\))?\s*(.*)$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse INSERT: {sql[:120]}")
    name = _norm_name(m.group(1))
    current = _read(engine, name)
    incoming = engine.sql(m.group(3))
    if m.group(2):
        cols = [_norm_name(c) for c in m.group(2).strip("()").split(",")]
        incoming = incoming.toDF(*cols)
        # Unmentioned columns get NULL (reference INSERT column-list rule).
        for f_ in current.schema.fields:
            if f_.name not in cols:
                incoming = incoming.withColumn(f_.name, F.lit(None).cast(f_.dataType))
    else:
        # No column list: positional match against the table layout.
        if len(incoming.columns) != len(current.columns):
            raise ValueError(
                f"INSERT arity mismatch: {len(incoming.columns)} values for "
                f"{len(current.columns)} columns"
            )
        incoming = incoming.toDF(*[f_.name for f_ in current.schema.fields])
    aligned = incoming.select(
        *[F.col(f_.name).cast(f_.dataType).alias(f_.name) for f_ in current.schema.fields]
    )
    # Inserted count from footer metadata (before/after), not a second
    # scan of the incoming relation.
    before = _written_rows(_require_managed(engine, name))
    total = _commit(engine, name, current.unionByName(aligned))
    return engine.spark.createDataFrame([(total - before,)], "rows: bigint")


def _delete(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"DELETE\s+FROM\s+({_IDENT}(?:\.{_IDENT})*)\s*(?:WHERE\s+(.*))?$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse DELETE: {sql[:120]}")
    name = _norm_name(m.group(1))
    df = _read(engine, name)
    before = df.count()
    if m.group(2) is None:
        kept = df.limit(0)
    else:
        pred = _translate_fragment(engine, m.group(2))
        # DELETE removes rows where pred is TRUE; NULL predicate keeps.
        kept = df.filter(~F.coalesce(F.expr(pred), F.lit(False)))
    after = _commit(engine, name, kept)
    return engine.spark.createDataFrame([(before - after,)], "rows: bigint")


def _update(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"UPDATE\s+({_IDENT}(?:\.{_IDENT})*)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse UPDATE: {sql[:120]}")
    name = _norm_name(m.group(1))
    df = _read(engine, name)
    assigns = _split_top_level(m.group(2), ",")
    pred = F.expr(_translate_fragment(engine, m.group(3))) if m.group(3) else F.lit(True)
    pred = F.coalesce(pred, F.lit(False))
    updated_cols = {}
    for a in assigns:
        col, _, expr = a.partition("=")
        updated_cols[_norm_name(col)] = F.expr(_translate_fragment(engine, expr))
    out = df.select(
        *[
            (F.when(pred, updated_cols[f_.name].cast(f_.dataType)).otherwise(F.col(f_.name)) if f_.name in updated_cols else F.col(f_.name)).alias(f_.name)
            for f_ in df.schema.fields
        ]
    )
    n_updated = df.filter(pred).count()
    _commit(engine, name, out)
    return engine.spark.createDataFrame([(n_updated,)], "rows: bigint")


def _split_top_level(text: str, sep: str) -> list[str]:
    out, depth, cur, in_str = [], 0, [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
        if not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == sep and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [s for s in out if s]


_MERGE_RE = re.compile(
    rf"MERGE\s+INTO\s+({_IDENT}(?:\.{_IDENT})*)\s*(?:AS\s+)?({_IDENT})?\s+"
    rf"USING\s+(\(.*?\)|{_IDENT}(?:\.{_IDENT})*)\s*(?:AS\s+)?({_IDENT})?\s+"
    rf"ON\s+(.*?)\s+(WHEN\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)

_WHEN_RE = re.compile(
    r"WHEN\s+(NOT\s+MATCHED|MATCHED)\s*(?:AND\s+(.*?))?\s*THEN\s+"
    r"(DELETE|UPDATE\s+SET\s+.*?|INSERT\s*(?:\([^)]*\))?\s*VALUES\s*\(.*?\))\s*"
    r"(?=WHEN\s|$)",
    re.IGNORECASE | re.DOTALL,
)


def _merge(engine, sql: str) -> DataFrame:
    """MERGE INTO via the full-outer-join rewrite (operators/merge.py).

    Supported clause shapes (the reference applies clauses first-match-wins,
    MergeProcessorOperator row routing): any of
      WHEN MATCHED [AND c] THEN DELETE
      WHEN MATCHED [AND c] THEN UPDATE SET col = expr, ...
      WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs)
    with at most one clause of each kind; a conditional UPDATE listed before
    an unconditional DELETE is rejected (priority would differ from the
    join rewrite's delete-then-update routing).
    """
    m = _MERGE_RE.match(sql)
    if not m:
        raise ValueError(f"cannot parse MERGE: {sql[:160]}")
    tgt_name = _norm_name(m.group(1))
    t_alias = (m.group(2) or tgt_name).strip('"')
    src_rel, s_alias = m.group(3), (m.group(4) or "src").strip('"')
    on_cond = m.group(5)
    target = _read(engine, tgt_name)
    if src_rel.startswith("("):
        source = engine.sql(src_rel[1:-1])
    else:
        source = engine.catalog.table(_norm_name(src_rel))

    def sub(expr: str) -> str:
        """Map t.col -> col, s.col -> s_col (merge_into's naming contract)."""
        expr = re.sub(rf"\b{re.escape(s_alias)}\.(\w+)", r"s_\1", expr, flags=re.IGNORECASE)
        expr = re.sub(rf"\b{re.escape(t_alias)}\.(\w+)", r"\1", expr, flags=re.IGNORECASE)
        return _translate_fragment(engine, expr)

    # Equi-key extraction from the ON conjunction.
    keys = []
    for piece in re.split(r"\bAND\b", on_cond, flags=re.IGNORECASE):
        em = re.match(
            rf"\s*(?:{re.escape(t_alias)}|{re.escape(s_alias)})\.(\w+)\s*=\s*"
            rf"(?:{re.escape(t_alias)}|{re.escape(s_alias)})\.(\w+)\s*$",
            piece,
            re.IGNORECASE,
        )
        if not em or em.group(1).lower() != em.group(2).lower():
            raise ValueError(f"MERGE ON must be a conjunction of t.k = s.k equalities, got: {piece.strip()}")
        keys.append(em.group(1).lower())

    update_set: dict | None = None
    update_cond = delete_cond = None
    insert_values: dict | None = None
    for wm in _WHEN_RE.finditer(m.group(6)):
        matched_kw, and_cond, action = wm.group(1).upper(), wm.group(2), wm.group(3)
        act_up = action.upper()
        if matched_kw == "MATCHED" and act_up == "DELETE":
            if update_set is not None:
                # The reference routes rows first-match-wins
                # (MergeProcessorOperator); the join rewrite applies DELETE
                # before UPDATE, so only that clause order is equivalent.
                raise ValueError("MERGE: place WHEN MATCHED ... DELETE before UPDATE")
            delete_cond = F.expr(sub(and_cond)) if and_cond else F.lit(True)
        elif matched_kw == "MATCHED" and act_up.startswith("UPDATE"):
            update_cond = F.expr(sub(and_cond)) if and_cond else None
            update_set = {}
            for a in _split_top_level(action.split(None, 2)[2], ","):
                col, _, expr = a.partition("=")
                update_set[_norm_name(col)] = F.expr(sub(expr))
        elif matched_kw == "NOT MATCHED" and act_up.startswith("INSERT"):
            im = re.match(r"INSERT\s*(\([^)]*\))?\s*VALUES\s*\((.*)\)\s*$", action, re.IGNORECASE | re.DOTALL)
            if not im:
                raise ValueError(f"cannot parse MERGE INSERT action: {action[:80]}")
            cols = (
                [_norm_name(c) for c in im.group(1).strip("()").split(",")]
                if im.group(1)
                else [f.name for f in target.schema.fields]
            )
            vals = _split_top_level(im.group(2), ",")
            if len(cols) != len(vals):
                raise ValueError("MERGE INSERT column/value count mismatch")
            insert_values = {c: F.expr(sub(v)) for c, v in zip(cols, vals)}
        else:
            raise ValueError(f"unsupported MERGE clause: WHEN {matched_kw} ... THEN {action[:40]}")

    if update_set is not None and update_cond is not None:
        # merge_into applies update to every surviving matched row; narrow
        # each assignment with the clause condition.
        update_set = {
            c: F.when(F.coalesce(update_cond, F.lit(False)), e).otherwise(F.col(c))
            for c, e in update_set.items()
        }
    if insert_values is not None:
        insert_values = {
            c: e.cast(target.schema[c].dataType) for c, e in insert_values.items() if c in target.columns
        }

    out = merge_into(
        target,
        source,
        keys=keys,
        update_set=update_set,
        delete_condition=delete_cond,
        insert_values=insert_values,
    )
    # Affected rows (TableFinish count): matched target rows + inserted rows.
    src_keyed = source.select(*[F.col(k) for k in keys]).dropDuplicates(keys)
    matched_n = target.join(src_keyed, on=keys, how="left_semi").count()
    inserted_n = (
        src_keyed.join(target, on=keys, how="left_anti").count() if insert_values is not None else 0
    )
    _commit(engine, tgt_name, out)
    return engine.spark.createDataFrame([(matched_n + inserted_n,)], "rows: bigint")


# ---------------------------------------------------------------- transactions
#
# Trino's transaction statements (grammar SqlBase.g4 START TRANSACTION /
# COMMIT / ROLLBACK; io.trino.execution.StartTransactionTask). Engine DML is
# copy-on-write, so a transaction is a SNAPSHOT of the managed tables'
# directories: START records (and lazily preserves) the pre-transaction
# state, ROLLBACK restores it, COMMIT discards the snapshots. This is the
# filesystem analog of a lakehouse snapshot pin — at scale the "copy" is
# the table-format metadata pointer, not data movement; here the directory
# is copied aside once per (table, transaction) — the current directory must
# stay readable because the mutating statement itself reads it lazily. A
# lakehouse format would pin the old snapshot id instead of copying.


def txn_begin(engine) -> None:
    if getattr(engine, "_txn", None) is not None:
        raise ValueError("transaction already in progress (no nested transactions)")
    engine._txn = {"snapshots": {}, "created": set()}


def txn_snapshot_if_needed(engine, name: str) -> None:
    """Before the first in-transaction mutation of `name`, move the current
    directory aside as the rollback snapshot (the next _commit writes a
    fresh directory)."""
    txn = getattr(engine, "_txn", None)
    if txn is None or name in txn["snapshots"] or name in txn["created"]:
        return
    path = _managed(engine).get(name)
    if path is None:
        txn["created"].add(name)  # table born inside the txn: rollback drops it
        return
    snap = f"{path}.txn-{uuid.uuid4().hex[:8]}"
    shutil.copytree(path, snap)
    txn["snapshots"][name] = snap


def txn_commit(engine) -> None:
    txn = getattr(engine, "_txn", None)
    if txn is None:
        raise ValueError("no transaction in progress")
    for snap in txn["snapshots"].values():
        shutil.rmtree(snap, ignore_errors=True)
    engine._txn = None


def txn_rollback(engine) -> None:
    txn = getattr(engine, "_txn", None)
    if txn is None:
        raise ValueError("no transaction in progress")
    for name, snap in txn["snapshots"].items():
        path = os.path.join(_warehouse_dir(), name)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(snap, path)
        _managed(engine)[name] = path
        engine.spark.read.parquet(path).createOrReplaceTempView(name)
    for name in txn["created"]:
        path = _managed(engine).pop(name, None)
        if path:
            shutil.rmtree(path, ignore_errors=True)
            engine.spark.catalog.dropTempView(name)
    engine._txn = None


# ---------------------------------------------------------------- DDL
#
# CREATE VIEW (logical, lazily re-resolved), plain CREATE TABLE (empty
# managed table from a column list), and ALTER TABLE column evolution —
# the remaining statement surface of the reference's metadata entry point
# (CreateViewTask.java, CreateTableTask.java, AddColumnTask.java /
# DropColumnTask.java / RenameColumnTask.java). ALTER on a managed table
# is a projection rewrite + copy-on-write commit: schema evolution without
# a metastore.


def try_execute_ddl(engine, sql: str) -> DataFrame | None:
    stripped = sql.strip().rstrip(";")
    up = stripped.upper().split()
    if up[:2] == ["CREATE", "VIEW"] or up[:4] == ["CREATE", "OR", "REPLACE", "VIEW"]:
        return _create_view(engine, stripped)
    if up[:2] == ["DROP", "VIEW"]:
        parts = stripped.split()
        idx = 4 if len(parts) > 4 and parts[2].upper() == "IF" else 2
        name = _norm_name(parts[idx])
        existed = engine.views.pop(name, None) if hasattr(engine, "views") else None
        if existed is None and idx == 2:
            raise ValueError(f"view not found: {name}")
        if existed is not None:
            engine.spark.catalog.dropTempView(name)
        return engine.spark.createDataFrame([(name,)], "view: string")
    if up[:3] == ["SHOW", "CREATE", "VIEW"]:
        name = _norm_name(stripped.split()[3])
        views = getattr(engine, "views", {})
        if name not in views:
            raise ValueError(f"view not found: {name}")
        return engine.spark.createDataFrame(
            [(f"CREATE VIEW {name} AS\n{views[name]}",)], "create_view: string"
        )
    if up[:2] == ["CREATE", "TABLE"] and " AS " not in f" {stripped.upper()} ":
        return _create_empty_table(engine, stripped)
    if up[:2] == ["ALTER", "TABLE"]:
        return _alter_table(engine, stripped)
    return None


def _create_view(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+({_IDENT}(?:\.{_IDENT})*)\s+AS\s+(.*)$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse CREATE VIEW: {sql[:120]}")
    name, defn = _norm_name(m.group(1)), m.group(2).strip()
    if not hasattr(engine, "views"):
        engine.views = {}
    if name in engine.views and "OR REPLACE" not in sql.upper()[:40]:
        raise ValueError(f"view already exists: {name}")
    # Lazy logical view: the DataFrame plan re-reads sources at query time
    # (CreateViewTask semantics — definition resolved, data not stored).
    engine.sql(defn).createOrReplaceTempView(name)
    engine.views[name] = defn
    refresh_infoschema(engine, changed=name)
    return engine.spark.createDataFrame([(name,)], "view: string")


def _create_empty_table(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?({_IDENT}(?:\.{_IDENT})*)\s*\((.*)\)\s*(?:WITH\s*\(.*\))?\s*$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse CREATE TABLE: {sql[:120]}")
    name = _norm_name(m.group(1))
    if name in _managed(engine):
        if re.search(r"IF\s+NOT\s+EXISTS", sql, re.IGNORECASE):
            return engine.spark.createDataFrame([(0,)], "rows: bigint")
        raise ValueError(f"table already exists: {name}")
    cols = []
    for piece in _split_top_level(m.group(2), ","):
        parts = piece.split(None, 1)
        if len(parts) != 2:
            raise ValueError(f"cannot parse column definition: {piece}")
        cols.append(f"{_norm_name(parts[0])} {_trino_type_to_spark(parts[1])}")
    empty = engine.spark.createDataFrame([], ", ".join(cols))
    _commit(engine, name, empty)
    return engine.spark.createDataFrame([(0,)], "rows: bigint")


def _trino_type_to_spark(t: str) -> str:
    t = t.strip().rstrip(",").lower()
    t = re.sub(r"\bvarchar(\(\d+\))?", "string", t)
    t = re.sub(r"\bchar\((\d+)\)", "string", t)
    t = t.replace("varbinary", "binary").replace("real", "float")
    t = re.sub(r"\binteger\b", "int", t)
    t = re.sub(r"\btime\b(?!stamp)", "bigint", t)  # TIME emulated as nanos-of-day
    return t


def _alter_table(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"ALTER\s+TABLE\s+({_IDENT}(?:\.{_IDENT})*)\s+(.*)$", sql, re.IGNORECASE | re.DOTALL
    )
    if not m:
        raise ValueError(f"cannot parse ALTER TABLE: {sql[:120]}")
    name, action = _norm_name(m.group(1)), m.group(2).strip()
    df = _read(engine, name)
    au = action.upper()
    if au.startswith("ADD COLUMN"):
        am = re.match(r"ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+(.+)$", action, re.IGNORECASE)
        col, typ = _norm_name(am.group(1)), _trino_type_to_spark(am.group(2))
        if col in df.columns:
            if re.search(r"IF\s+NOT\s+EXISTS", action, re.IGNORECASE):
                return engine.spark.createDataFrame([(0,)], "rows: bigint")
            raise ValueError(f"column already exists: {col}")
        out = df.withColumn(col, F.lit(None).cast(typ))
    elif au.startswith("DROP COLUMN"):
        col = _norm_name(action.split()[2])
        if col not in df.columns:
            raise ValueError(f"column not found: {col}")
        if len(df.columns) == 1:
            raise ValueError("cannot drop the only column")
        out = df.drop(col)
    elif au.startswith("RENAME COLUMN"):
        am = re.match(r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", action, re.IGNORECASE)
        old, new = _norm_name(am.group(1)), _norm_name(am.group(2))
        if old not in df.columns:
            raise ValueError(f"column not found: {old}")
        out = df.withColumnRenamed(old, new)
    elif au.startswith("RENAME TO"):
        new = _norm_name(action.split()[2])
        path = _require_managed(engine, name)
        newpath = os.path.join(_warehouse_dir(), new)
        os.rename(path, newpath)
        tables = _managed(engine)
        del tables[name]
        tables[new] = newpath
        engine.spark.catalog.dropTempView(name)
        engine.spark.read.parquet(newpath).createOrReplaceTempView(new)
        return engine.spark.createDataFrame([(0,)], "rows: bigint")
    else:
        raise ValueError(f"unsupported ALTER TABLE action: {action[:60]}")
    _commit(engine, name, out)
    return engine.spark.createDataFrame([(0,)], "rows: bigint")


def refresh_infoschema(engine, changed: str | None = None, dropped: str | None = None) -> None:
    """Re-register information_schema views to include engine-created
    tables and views (the reference's information_schema reflects DDL
    immediately — InformationSchemaMetadata.java).

    Incremental: the per-table schema dict is cached on the engine and
    only the changed/dropped entry is recomputed — a DML statement must
    not pay a full catalog schema scan per commit."""
    from trino_spark.infoschema import register_information_schema

    cache = getattr(engine, "_infoschema_cache", None)
    if cache is None or (changed is None and dropped is None):
        cache = {}
        for name in list(engine.catalog._sources) + list(_managed(engine)) + list(
            getattr(engine, "views", {})
        ) + list(engine.materialized_views):
            try:
                cache[name] = [
                    (f.name, f.dataType.simpleString()) for f in engine.spark.table(name).schema
                ]
            except Exception:
                continue
        engine._infoschema_cache = cache
    if dropped is not None:
        cache.pop(dropped, None)
    if changed is not None:
        try:
            cache[changed] = [
                (f.name, f.dataType.simpleString()) for f in engine.spark.table(changed).schema
            ]
        except Exception:
            cache.pop(changed, None)
    register_information_schema(engine.spark, cache)
