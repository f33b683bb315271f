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
(Trino's TableFinish output) comes from parquet footer metadata or an
``Observation`` folded into the commit's own write job — never a second
scan of the data.

Partition-scoped copy-on-write: on a partitioned table, DELETE/UPDATE
derive the affected partitions dynamically (one pruned scan collecting the
matching files' partition dirs + values), rewrite ONLY those partitions,
and carry every untouched partition into the new table version by
HARDLINKING its files (metadata-only, no data movement) — the filesystem
analog of Delta/Iceberg file-scoped copy-on-write, where unaffected data
files are carried by pointer in the new snapshot. INSERT likewise appends:
it writes only the incoming rows and links the entire previous version.
At 100 TB a selective `DELETE WHERE day = ...` therefore rewrites one
partition, not the table.

Every commit is retained as a table VERSION (snapshot log under
``.snapshots/<name>/``), read back via Trino's time-travel syntax
``FOR VERSION AS OF n`` / ``FOR TIMESTAMP AS OF t`` (grammar SqlBase.g4
queryPeriod; behavior: plugin/trino-iceberg time travel). Old versions are
pruned beyond a retention window, like snapshot expiration.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, Observation, functions as F

from trino_spark.operators.merge import merge_into

#: retained historical versions per table (current version excluded);
#: older snapshot dirs are removed — lakehouse snapshot expiration.
SNAPSHOT_RETENTION = 8

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


def _snap_root(name: str) -> str:
    return os.path.join(_warehouse_dir(), ".snapshots", name)


def _read_log(name: str) -> list[dict]:
    logf = os.path.join(_snap_root(name), "log.json")
    if not os.path.exists(logf):
        return []
    try:
        return json.loads(open(logf).read())
    except (OSError, ValueError):
        return []


def _write_log(name: str, entries: list[dict]) -> None:
    root = _snap_root(name)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".log-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(entries, fh, indent=0)
    os.replace(tmp, os.path.join(root, "log.json"))


def _link_tree(src_root: str, dst_root: str, rel_dirs: list[str] | None = None) -> None:
    """Hardlink every data file under `src_root` (or only the given leaf
    dirs) into `dst_root`, preserving relative paths. Links are metadata
    operations — carrying an untouched 1 TB partition into the new table
    version costs directory entries, not I/O. Falls back to copy when the
    filesystem refuses links."""

    def _link_dir(rel: str) -> None:
        sdir = os.path.join(src_root, rel) if rel else src_root
        for root, _dirs, files in os.walk(sdir):
            for f in files:
                if f.startswith(("_", ".")):
                    continue  # _SUCCESS / hidden metadata
                sp = os.path.join(root, f)
                rp = os.path.relpath(sp, src_root)
                dp = os.path.join(dst_root, rp)
                os.makedirs(os.path.dirname(dp), exist_ok=True)
                try:
                    os.link(sp, dp)
                except OSError:
                    shutil.copy2(sp, dp)

    if rel_dirs is None:
        _link_dir("")
    else:
        for rel in rel_dirs:
            _link_dir(rel)


def _leaf_partition_dirs(path: str) -> list[str]:
    """Relative paths of every directory under `path` that directly holds
    parquet files (the hive-layout leaf partitions). '' = flat root files."""
    out = []
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            out.append(os.path.relpath(root, path))
    return ["" if d == "." else d for d in out]


def _commit(
    engine,
    name: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
    preserve_rel_dirs: list[str] | None = None,
    append_base: bool = False,
    operation: str = "write",
) -> int:
    """Copy-on-write commit: stage-write the post-change relation, swap the
    table directory, re-register the view. Returns rows in the new state.

    `partition_by` produces a hive-style layout (downstream scans get
    static partition pruning + DPP); mutations preserve the layout.
    `preserve_rel_dirs` carries the listed untouched partition dirs of the
    CURRENT version into the new one by hardlink (partition-scoped
    rewrite). `append_base` carries the ENTIRE current version and adds
    `df` on top (INSERT). The previous version's directory is retained as
    a snapshot for time travel rather than deleted."""
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
    # Record the LOGICAL column order (hive-partitioned parquet reads put
    # partition columns last; _read restores this order so positional
    # INSERT and SELECT * keep the declared layout). Every commit's df is
    # already logical: CTAS builds it, mutations derive from _read.
    logical = getattr(engine, "_dml_logical_cols", None)
    if logical is None:
        logical = engine._dml_logical_cols = {}
    logical[name] = list(df.columns)
    w = df.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(staging)
    if os.path.isdir(path):
        if append_base:
            # INSERT: new version = all previous files (linked) + new rows.
            # A flat 0-row placeholder in a partitioned layout (freshly
            # created / truncated table) is skipped — linking it next to
            # hive dirs would break partition discovery, and it holds no
            # rows.
            rels = _leaf_partition_dirs(path)
            if not (part_cols and rels == [""] and _written_rows(path) == 0):
                _link_tree(path, staging, rels)
        elif preserve_rel_dirs:
            _link_tree(path, staging, preserve_rel_dirs)
    if not any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(staging) for f in fs
    ):
        # Zero rows + partitionBy writes no part files, and a dir with no
        # parquet cannot be re-read ("unable to infer schema"). Rewrite the
        # empty state flat — the file carries the full schema (partition
        # columns included) and the layout reapplies on the next insert.
        shutil.rmtree(staging, ignore_errors=True)
        df.limit(0).write.mode("overwrite").parquet(staging)
    # Version bookkeeping: retire the current directory into the snapshot
    # log (time travel reads it back); prune beyond retention.
    log = _read_log(name)
    cur_version = max((e["version"] for e in log), default=0)
    if os.path.exists(path):
        os.rename(path, os.path.join(_ensure_dir(_snap_root(name)), f"v{cur_version:05d}"))
    new_version = cur_version + 1
    now = _dt.datetime.now(_dt.timezone.utc)
    log.append(
        {
            "version": new_version,
            "committed_at": now.timestamp(),
            "committed_at_iso": now.isoformat(),
            "operation": operation,
            # Column order AS DECLARED at this version (time-travel reads
            # restore it; the live _dml_logical_cols map only tracks the
            # current schema, which later ALTERs may have changed).
            "columns": list(df.columns),
        }
    )
    live = [e for e in log if not e.get("expired")]
    for e in live[:-(SNAPSHOT_RETENTION + 1)]:
        shutil.rmtree(os.path.join(_snap_root(name), f"v{e['version']:05d}"), ignore_errors=True)
        e["expired"] = True
    _write_log(name, log)
    os.rename(staging, path)
    _managed(engine)[name] = path
    # Register the new version. The committed schema is known (partition
    # columns read back LAST in a hive layout), so pass it explicitly —
    # skipping the footer/partition-discovery inference job per commit.
    reader = engine.spark.read
    try:
        fields = {f.name: f for f in df.schema.fields}
        if part_cols and all(c in fields for c in part_cols):
            ordered = [f for f in df.schema.fields if f.name not in part_cols] + [
                fields[c] for c in part_cols
            ]
        else:
            ordered = list(df.schema.fields)
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType(ordered))
    except Exception:
        pass
    stored = reader.parquet(path)
    # The registered view presents the DECLARED column order, not the
    # partition-last physical layout (SELECT * parity with the reference).
    lcols = logical.get(name)
    if lcols and lcols != stored.columns and set(lcols) == set(stored.columns):
        stored = stored.select(*lcols)
    stored.createOrReplaceTempView(name)
    refresh_infoschema(engine, changed=name)
    return _written_rows(path)


def _ensure_dir(d: str) -> str:
    os.makedirs(d, exist_ok=True)
    return d


def _read(engine, name: str) -> DataFrame:
    df = engine.spark.read.parquet(_require_managed(engine, name))
    # Restore the declared column order (partitioned layouts read the
    # partition columns last).
    logical = getattr(engine, "_dml_logical_cols", {}).get(name)
    if logical and logical != df.columns and set(logical) == set(df.columns):
        df = df.select(*logical)
    return df


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
    if name in _managed(engine):
        if if_not_exists:
            return engine.spark.createDataFrame([(0,)], "rows: bigint")
        raise ValueError(f"table already exists: {name}")
    # A fresh table must not inherit a stale layout from a same-named
    # predecessor (layouts are popped at DROP, but be defensive).
    getattr(engine, "_dml_layouts", {}).pop(name, None)
    getattr(engine, "_dml_logical_cols", {}).pop(name, None)
    partition_by = _parse_with_props(m.group(2))
    df = engine.sql(m.group(3))
    n = _commit(engine, name, df, partition_by=partition_by, operation="ctas")
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
        shutil.rmtree(_snap_root(name), ignore_errors=True)
        # A later CREATE TABLE with this name must not inherit the old
        # partition layout (stale _dml_layouts entry).
        getattr(engine, "_dml_layouts", {}).pop(name, None)
        getattr(engine, "_dml_logical_cols", {}).pop(name, None)
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
    _commit(engine, name, df.limit(0), operation="truncate")
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
        # Unmentioned columns get their declared DEFAULT, else NULL
        # (reference INSERT column-list rule + #setDefaultValue).
        defaults = getattr(engine, "_column_defaults", {})
        for f_ in current.schema.fields:
            if f_.name not in cols:
                dflt = defaults.get((name, f_.name))
                filler = F.expr(dflt) if dflt is not None else F.lit(None)
                incoming = incoming.withColumn(f_.name, filler.cast(f_.dataType))
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
    # Append-only commit: write ONLY the incoming rows; the previous
    # version's files are carried into the new version by hardlink (the
    # lakehouse "add files to snapshot" shape — an INSERT never rewrites
    # existing data). Inserted count from footer metadata (before/after).
    before = _written_rows(_require_managed(engine, name))
    total = _commit(engine, name, aligned, append_base=True, operation="insert")
    return engine.spark.createDataFrame([(total - before,)], "rows: bigint")


def _affected_partitions(engine, name: str, df: DataFrame, pred):
    """Dynamically derive the partitions a predicate touches: one pruned
    scan collecting (file, partition values) of matching rows. Returns
    (affected_row_filter, untouched_rel_dirs) or None when the
    partition-scoped path does not apply (unpartitioned / flat layout /
    nothing matched → caller short-circuits on []).

    This is the engine-side analog of the reference's metadata-delete
    partition derivation (TableMutationOperator.java) and of Delta's
    find-touched-files phase. The collect is bounded by the number of
    AFFECTED data files (metadata scale, not data scale)."""
    from urllib.parse import unquote, urlparse

    part_cols = getattr(engine, "_dml_layouts", {}).get(name)
    path = _require_managed(engine, name)
    if not part_cols:
        return None
    leafs = _leaf_partition_dirs(path)
    if "" in leafs:
        return None  # flat/placeholder layout: full rewrite
    touched = (
        df.filter(pred)
        .select(F.input_file_name().alias("__f"), *part_cols)
        .distinct()
        .collect()
    )
    real = os.path.realpath(path)
    affected_dirs = set()
    affected_vals = set()
    for r in touched:
        fpath = os.path.realpath(unquote(urlparse(r["__f"]).path))
        affected_dirs.add(os.path.relpath(os.path.dirname(fpath), real))
        affected_vals.add(tuple(r[c] for c in part_cols))
    if not touched:
        return (None, [])
    untouched = [d for d in leafs if d not in affected_dirs]
    if not untouched:
        # every partition is affected: the scoped machinery would only add
        # an isin-filter over the full scan — plain full rewrite is the
        # same work with a simpler plan
        return None
    cond = None
    for vals in affected_vals:
        piece = None
        for c, v in zip(part_cols, vals):
            eq = F.col(c).eqNullSafe(F.lit(v))
            piece = eq if piece is None else piece & eq
        cond = piece if cond is None else cond | piece
    return (cond, untouched)


def _delete(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"DELETE\s+FROM\s+({_IDENT}(?:\.{_IDENT})*)\s*(?:WHERE\s+(.*))?$",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse DELETE: {sql[:120]}")
    name = _norm_name(m.group(1))
    from trino_spark.dialect import access as _access

    rf_sql, masks = _access.dml_target_security(engine, name)
    df = _read(engine, name)
    # Row filter on the DML target (ConnectorAccessControl.getRowFilters
    # binds to the target scan too): rows the role cannot see are
    # untouchable. Evaluated on REAL rows; the user's WHERE sees MASKED
    # values (mask_fragment), matching read-side semantics.
    visible = (
        F.coalesce(F.expr(_translate_fragment(engine, rf_sql)), F.lit(False))
        if rf_sql
        else None
    )
    if m.group(2) is None and visible is None and not masks:
        # Unconditional DELETE == TRUNCATE shape; count from footers.
        before = _written_rows(_require_managed(engine, name))
        _commit(engine, name, df.limit(0), operation="delete")
        return engine.spark.createDataFrame([(before,)], "rows: bigint")
    # DELETE removes rows where pred is TRUE; NULL predicate keeps.
    where = m.group(2) if m.group(2) is not None else "true"
    pred = F.coalesce(
        F.expr(
            _translate_fragment(engine, _access.mask_fragment(masks, where, target=name))
        ),
        F.lit(False),
    )
    if visible is not None:
        pred = pred & visible
    # Deleted-row count = footer-metadata delta (before/after) — rows only
    # ever leave, so no counting scan or observation is needed.
    before = _written_rows(_require_managed(engine, name))
    scoped = _affected_partitions(engine, name, df, pred)
    if scoped is not None:
        cond, untouched = scoped
        if cond is None:  # predicate matched nothing: no new version
            return engine.spark.createDataFrame([(0,)], "rows: bigint")
        # Rewrite only the affected partitions (partition-pruned scan);
        # untouched partitions are hardlinked into the new version.
        after = _commit(
            engine, name, df.filter(cond).filter(~pred),
            preserve_rel_dirs=untouched, operation="delete",
        )
    else:
        after = _commit(engine, name, df.filter(~pred), operation="delete")
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
    from trino_spark.dialect import access as _access

    rf_sql, masks = _access.dml_target_security(engine, name)
    if masks:
        # Reference parity (StatementAnalyzer): "Updating a table with
        # column masks is not supported" — a SET expression could read a
        # masked column's raw value (exfiltration) or, masked, silently
        # destroy data via `SET c = c`. Fail closed.
        raise _access.AccessDenied(
            f"Access Denied: updating column-masked table {name} is not allowed"
        )
    df = _read(engine, name)
    assigns = _split_top_level(m.group(2), ",")
    pred = F.expr(_translate_fragment(engine, m.group(3))) if m.group(3) else F.lit(True)
    pred = F.coalesce(pred, F.lit(False))
    if rf_sql:
        # Target row filter (getRowFilters binds to the UPDATE scan too):
        # rows the role cannot see are untouchable.
        pred = pred & F.coalesce(F.expr(_translate_fragment(engine, rf_sql)), F.lit(False))
    updated_cols = {}
    for a in assigns:
        col, _, expr = a.partition("=")
        updated_cols[_norm_name(col)] = F.expr(_translate_fragment(engine, expr))

    def _project(src: DataFrame) -> DataFrame:
        return src.select(
            *[
                (
                    F.when(pred, updated_cols[f_.name].cast(f_.dataType)).otherwise(F.col(f_.name))
                    if f_.name in updated_cols
                    else F.col(f_.name)
                ).alias(f_.name)
                for f_ in df.schema.fields
            ]
        )

    part_cols = getattr(engine, "_dml_layouts", {}).get(name) or []
    # An UPDATE that reassigns a partition column can move rows into
    # partitions the predicate never touched — only the full rewrite is
    # correct there. (Moving INTO an untouched partition is fine in the
    # scoped path: the staged write and the hardlinked files merge into
    # the same partition dir.)
    scoped = (
        _affected_partitions(engine, name, df, pred)
        if not any(c in updated_cols for c in part_cols)
        else None
    )
    obs = Observation()
    n_expr = F.sum(pred.cast("long")).alias("n")
    if scoped is not None:
        cond, untouched = scoped
        if cond is None:
            return engine.spark.createDataFrame([(0,)], "rows: bigint")
        out = _project(df.filter(cond).observe(obs, n_expr))
        _commit(engine, name, out, preserve_rel_dirs=untouched, operation="update")
    else:
        out = _project(df.observe(obs, n_expr))
        _commit(engine, name, out, operation="update")
    return engine.spark.createDataFrame([(int(obs.get["n"] or 0),)], "rows: bigint")


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
    from trino_spark.dialect import access as _access

    rf_sql, masks = _access.dml_target_security(engine, tgt_name)
    if masks:
        # Fail closed: MERGE clause expressions could route a masked
        # column's raw value through the join rewrite; the reference
        # likewise denies table mutation when masks bind to the target.
        raise _access.AccessDenied(
            f"Access Denied: MERGE into column-masked table {tgt_name} is not allowed"
        )
    target = _read(engine, tgt_name)
    hidden = None
    if rf_sql:
        # Row-filtered MERGE target: only visible rows participate in the
        # join (an invisible matched row is NOT MATCHED, exactly as if the
        # filtered scan fed the merge); invisible rows are carried through
        # untouched and unioned back into the committed version.
        vis = F.coalesce(F.expr(_translate_fragment(engine, rf_sql)), F.lit(False))
        hidden = target.filter(~vis)
        target = target.filter(vis)
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

    update_touch = update_cond if update_set is not None else None
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

    # Affected rows (TableFinish count) ride the merge join itself as an
    # Observation: rows a clause actually touched (deleted / updated under
    # the clause condition / inserted) — an insert-only MERGE reports only
    # inserts, matching MergeWriterOperator's written-row accounting. No
    # separate counting joins.
    obs = Observation()
    out = merge_into(
        target,
        source,
        keys=keys,
        update_set=update_set,
        delete_condition=delete_cond,
        insert_values=insert_values,
        count_into=obs,
        update_touch_condition=update_touch,
    )
    if hidden is not None:
        out = out.unionByName(hidden)
    _commit(engine, tgt_name, out, operation="merge")
    m_ = obs.get
    return engine.spark.createDataFrame(
        [(int((m_["touched"] or 0) + (m_["inserted"] or 0)),)], "rows: bigint"
    )


# ---------------------------------------------------------------- time travel
#
# Trino's queryPeriod grammar (SqlBase.g4: tableName FOR VERSION|TIMESTAMP
# AS OF expr; behavior: plugin/trino-iceberg + plugin/trino-delta-lake time
# travel). Every _commit retains the previous table directory as an
# immutable snapshot; reads resolve the requested version to its directory
# and substitute a temp view for the table reference.

_TT_RX = re.compile(
    rf"({_IDENT})\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"(TIMESTAMP\s+'[^']*'|'[^']*'|\d+)",
    re.IGNORECASE,
)


def list_versions(engine, name: str) -> list[dict]:
    """The snapshot log for a managed table (system.metadata-style history
    surface; Iceberg's $snapshots metadata table analog)."""
    _require_managed(engine, name)
    return _read_log(name)


def _version_dir(engine, name: str, version: int) -> str:
    path = _require_managed(engine, name)
    log = _read_log(name)
    cur = max((e["version"] for e in log), default=0)
    entry = next((e for e in log if e["version"] == version), None)
    if entry is None:
        raise ValueError(f"table {name}: version {version} does not exist")
    if version == cur:
        return path
    if entry.get("expired"):
        raise ValueError(
            f"table {name}: version {version} has been expired by snapshot retention"
        )
    return os.path.join(_snap_root(name), f"v{version:05d}")


_META_RX = re.compile(
    rf'"?({_IDENT})\$(snapshots|history|files|partitions|refs|properties)"?', re.IGNORECASE
)


def _file_rows(path: str) -> list[tuple]:
    """(file_path, file_format, partition, record_count, file_size_in_bytes)
    per data file of a table directory — counts from parquet FOOTERS, no
    data scan (exactly how FilesTable reads manifest entries, not files).
    file_path is relative to the table root; partition is the relative
    directory of a Hive-partitioned file (NULL for unpartitioned)."""
    import pyarrow.parquet as pq

    rows = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            rel_dir = os.path.relpath(root, path)
            rows.append(
                (
                    os.path.relpath(full, path),
                    "PARQUET",
                    None if rel_dir == "." else rel_dir,
                    pq.ParquetFile(full).metadata.num_rows,
                    os.path.getsize(full),
                )
            )
    return rows


def resolve_metadata_tables(engine, sql: str) -> str:
    """Iceberg-style metadata tables over the snapshot log and the current
    table directory: ``"t$snapshots"`` / ``"t$history"`` (SnapshotsTable /
    HistoryTable), ``"t$files"`` (FilesTable.java: per-file path, format,
    partition, record_count, file_size_in_bytes — straight from parquet
    footers), and ``"t$partitions"`` (PartitionsTable.java: per-partition
    row/file/byte totals). At scale these are metadata-only reads — the
    file listing and footers, never the data pages."""

    def repl(m: re.Match) -> str:
        name = _norm_name(m.group(1))
        if name not in _managed(engine):
            return m.group(0)
        kind = m.group(2).lower()
        if kind == "files":
            view = f"{name}__files"
            engine.spark.createDataFrame(
                _file_rows(_require_managed(engine, name)) or [],
                "file_path: string, file_format: string, partition: string, "
                "record_count: bigint, file_size_in_bytes: bigint",
            ).createOrReplaceTempView(view)
            return view
        if kind == "partitions":
            agg: dict = {}
            for _fp, _fmt, part, nrec, nbytes in _file_rows(_require_managed(engine, name)):
                c = agg.setdefault(part, [0, 0, 0])
                c[0] += nrec
                c[1] += 1
                c[2] += nbytes
            view = f"{name}__partitions"
            engine.spark.createDataFrame(
                [(p, c[0], c[1], c[2]) for p, c in sorted(agg.items(), key=lambda kv: str(kv[0]))] or [],
                "partition: string, record_count: bigint, file_count: bigint, "
                "total_size: bigint",
            ).createOrReplaceTempView(view)
            return view
        if kind == "refs":
            # Iceberg RefsTable analog: 'main' plus every branch, each with
            # the tip version of its own snapshot log.
            from trino_spark.dialect import branches as _br

            def _tip(log_name: str) -> int:
                return max((e["version"] for e in _read_log(log_name)), default=0)

            rows = [("main", "BRANCH", _tip(name))] + [
                (b, "BRANCH", _tip(_br._internal(name, b)))
                for b in sorted(_br._registry(name))
            ]
            view = f"{name}__refs"
            engine.spark.createDataFrame(
                rows, "name: string, type: string, version: bigint"
            ).createOrReplaceTempView(view)
            return view
        if kind == "properties":
            # Iceberg PropertiesTable analog: SET PROPERTIES key/values.
            props = getattr(engine, "_table_properties", {}).get(name, {})
            view = f"{name}__properties"
            engine.spark.createDataFrame(
                sorted(props.items()) or [], "key: string, value: string"
            ).createOrReplaceTempView(view)
            return view
        log = _read_log(name)
        cur = max((e["version"] for e in log), default=0)
        rows = [
            (
                e["version"],
                e["committed_at_iso"],
                e.get("operation", "write"),
                e["version"] == cur,
                bool(e.get("expired")),
            )
            for e in log
        ]
        view = f"{name}__snapshots"
        engine.spark.createDataFrame(
            rows or [],
            "version: bigint, committed_at: string, operation: string, "
            "is_current: boolean, expired: boolean",
        ).createOrReplaceTempView(view)
        return view

    return _META_RX.sub(repl, sql)


def resolve_time_travel(engine, sql: str) -> str:
    """Rewrite `tbl FOR VERSION AS OF n` / `tbl FOR TIMESTAMP AS OF t`
    table references to temp views over the pinned snapshot directory."""

    def repl(m: re.Match) -> str:
        name = _norm_name(m.group(1))
        if name not in _managed(engine):
            raise ValueError(f"time travel requires a managed table, got: {name}")
        kind, arg = m.group(2).upper(), m.group(3).strip()
        log = _read_log(name)
        if kind == "VERSION":
            version = int(arg)
        else:
            ts_txt = re.sub(r"^TIMESTAMP\s+", "", arg, flags=re.IGNORECASE).strip("'")
            ts = _dt.datetime.fromisoformat(ts_txt)
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            epoch = ts.timestamp()
            older = [e for e in log if e["committed_at"] <= epoch]
            if not older:
                raise ValueError(
                    f"table {name}: no version committed at or before {ts_txt}"
                )
            version = max(e["version"] for e in older)
        view = f"{name}__v{version}"
        snap = engine.spark.read.parquet(_version_dir(engine, name, version))
        # Restore THAT version's declared column order (recorded in its
        # log entry; fall back to the live map for pre-recording logs).
        entry = next((e for e in log if e["version"] == version), {})
        lcols = entry.get("columns") or getattr(
            engine, "_dml_logical_cols", {}
        ).get(name)
        if lcols and lcols != snap.columns and set(lcols) == set(snap.columns):
            snap = snap.select(*lcols)
        snap.createOrReplaceTempView(view)
        return view

    return _TT_RX.sub(repl, sql)


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
    shutil.copytree(path, snap, copy_function=os.link)  # hardlinks: metadata-only pin
    txn["snapshots"][name] = snap
    # Remember the version so rollback can rewind the snapshot log too.
    txn.setdefault("versions", {})[name] = max(
        (e["version"] for e in _read_log(name)), default=0
    )


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
        # Rewind the snapshot log: versions committed inside the aborted
        # transaction never happened.
        pin = txn.get("versions", {}).get(name, 0)
        log = _read_log(name)
        for e in log:
            # >= pin: the pinned version is live again, so its retired
            # snapshot dir must go too or the next commit's rename onto
            # .snapshots/v{pin} would collide.
            if e["version"] >= pin:
                shutil.rmtree(
                    os.path.join(_snap_root(name), f"v{e['version']:05d}"), ignore_errors=True
                )
        _write_log(name, [e for e in log if e["version"] <= pin])
        _managed(engine)[name] = path
        rolled = engine.spark.read.parquet(path)
        # The pinned version's recorded column order wins: an in-transaction
        # ALTER updated the live logical map, and the rollback must rewind
        # that bookkeeping along with the data.
        pinned = next((e for e in log if e["version"] == pin), {})
        lcols = pinned.get("columns") or getattr(
            engine, "_dml_logical_cols", {}
        ).get(name)
        if lcols:
            logical = getattr(engine, "_dml_logical_cols", None)
            if logical is None:
                logical = engine._dml_logical_cols = {}
            logical[name] = list(lcols)
        if lcols and lcols != rolled.columns and set(lcols) == set(rolled.columns):
            rolled = rolled.select(*lcols)
        rolled.createOrReplaceTempView(name)
    for name in txn["created"]:
        path = _managed(engine).pop(name, None)
        if path:
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(_snap_root(name), ignore_errors=True)
            getattr(engine, "_dml_layouts", {}).pop(name, None)
            getattr(engine, "_dml_logical_cols", {}).pop(name, None)
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
    if up[:2] == ["ALTER", "VIEW"]:
        # #renameView / #refreshView (grammar SqlBase.g4:130-131).
        views = getattr(engine, "views", {})
        m = re.match(
            r"ALTER\s+VIEW\s+([\w.\"]+)\s+(?:RENAME\s+TO\s+([\w.\"]+)|(REFRESH))\s*$",
            stripped,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse ALTER VIEW: {stripped[:80]}")
        name = _norm_name(m.group(1))
        if name not in views:
            raise ValueError(f"view not found: {name}")
        if m.group(3):  # REFRESH: re-resolve the definition against sources
            engine.sql(views[name]).createOrReplaceTempView(name)
            return engine.spark.createDataFrame([(name,)], "view: string")
        new = _norm_name(m.group(2))
        views[new] = views.pop(name)
        engine.spark.catalog.dropTempView(name)
        engine.sql(views[new]).createOrReplaceTempView(new)
        refresh_infoschema(engine, changed=new, dropped=name)
        return engine.spark.createDataFrame([(new,)], "view: string")
    if up[:3] == ["ALTER", "MATERIALIZED", "VIEW"]:
        # #renameMaterializedView: the stored data moves with the name.
        m = re.match(
            r"ALTER\s+MATERIALIZED\s+VIEW\s+(?:IF\s+EXISTS\s+)?([\w.\"]+)\s+RENAME\s+TO\s+([\w.\"]+)\s*$",
            stripped,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse ALTER MATERIALIZED VIEW: {stripped[:80]}")
        name, new = _norm_name(m.group(1)), _norm_name(m.group(2))
        if name not in engine.materialized_views:
            if re.search(r"IF\s+EXISTS", stripped, re.IGNORECASE):
                return engine.spark.createDataFrame([(name,)], "materialized_view: string")
            raise ValueError(f"materialized view not found: {name}")
        engine.materialized_views[new] = engine.materialized_views.pop(name)
        engine._mv_meta[new] = engine._mv_meta.pop(name, {})
        # MVs materialize under spark-warehouse/mv (engine._mv_refresh),
        # NOT the DML table dir.
        mv_dir = os.path.join(os.path.dirname(_warehouse_dir()), "mv")
        if os.path.isdir(os.path.join(mv_dir, name)):
            shutil.rmtree(os.path.join(mv_dir, new), ignore_errors=True)
            os.rename(os.path.join(mv_dir, name), os.path.join(mv_dir, new))
            engine.spark.read.parquet(os.path.join(mv_dir, new)).createOrReplaceTempView(new)
        engine.spark.catalog.dropTempView(name)
        return engine.spark.createDataFrame([(new,)], "materialized_view: string")
    if up[:2] in (["CREATE", "SCHEMA"], ["DROP", "SCHEMA"], ["ALTER", "SCHEMA"]) or up[:3] == [
        "SHOW", "CREATE", "SCHEMA",
    ]:
        return _schema_ddl(engine, stripped, up)
    return None


def _schemas(engine) -> dict:
    """Schema registry (#createSchema/#dropSchema/#renameSchema;
    CreateSchemaTask.java). The engine's table namespace is flat (every
    qualified name resolves by last component, like a single-schema
    catalog), so schemas are a metadata surface: SHOW SCHEMAS lists them,
    properties are retained for SHOW CREATE SCHEMA."""
    if not hasattr(engine, "schemas"):
        engine.schemas = {"default": {}}
    return engine.schemas


def _schema_ddl(engine, stripped: str, up: list[str]) -> DataFrame:
    reg = _schemas(engine)
    spark = engine.spark
    if up[:3] == ["SHOW", "CREATE", "SCHEMA"]:
        name = _norm_name(stripped.split()[3])
        if name not in reg:
            raise ValueError(f"schema not found: {name}")
        props = ""
        if reg[name]:
            kv = ",\n   ".join(f"{k} = '{v}'" for k, v in sorted(reg[name].items()))
            props = f"\nWITH (\n   {kv}\n)"
        return spark.createDataFrame(
            [(f"CREATE SCHEMA {name}{props}",)], "create_schema: string"
        )
    if up[:2] == ["CREATE", "SCHEMA"]:
        m = re.match(
            r"CREATE\s+SCHEMA\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.\"]+)"
            r"(?:\s+AUTHORIZATION\s+\S+)?(?:\s+WITH\s*\((?P<props>.*)\))?\s*$",
            stripped,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse CREATE SCHEMA: {stripped[:80]}")
        name = _norm_name(m.group("name"))
        if name in reg:
            if m.group("ine"):
                return spark.createDataFrame([(name,)], "schema: string")
            raise ValueError(f"schema already exists: {name}")
        reg[name] = {
            pm.group(1).lower(): pm.group(2)
            for pm in re.finditer(r"([\w.]+)\s*=\s*'([^']*)'", m.group("props") or "")
        }
        return spark.createDataFrame([(name,)], "schema: string")
    if up[:2] == ["DROP", "SCHEMA"]:
        m = re.match(
            r"DROP\s+SCHEMA\s+(?P<ie>IF\s+EXISTS\s+)?(?P<name>[\w.\"]+)(?:\s+(?:CASCADE|RESTRICT))?\s*$",
            stripped,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse DROP SCHEMA: {stripped[:80]}")
        name = _norm_name(m.group("name"))
        if name == "default":
            raise ValueError("cannot drop the default schema")
        if name not in reg:
            if m.group("ie"):
                return spark.createDataFrame([(name,)], "schema: string")
            raise ValueError(f"schema not found: {name}")
        reg.pop(name)
        return spark.createDataFrame([(name,)], "schema: string")
    # ALTER SCHEMA s RENAME TO s2
    m = re.match(
        r"ALTER\s+SCHEMA\s+([\w.\"]+)\s+RENAME\s+TO\s+([\w\"]+)\s*$", stripped, re.IGNORECASE
    )
    if not m:
        raise ValueError(f"cannot parse ALTER SCHEMA: {stripped[:80]}")
    name, new = _norm_name(m.group(1)), _norm_name(m.group(2))
    if name not in reg:
        raise ValueError(f"schema not found: {name}")
    reg[new] = reg.pop(name)
    return spark.createDataFrame([(new,)], "schema: string")


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
    # TIME WITH TIME ZONE: canonical-varchar carrier (functions/registry.py
    # r5 batch); plain TIME emulated as nanos-of-day bigints.
    t = re.sub(r"\btime(\(\d+\))?\s+with\s+time\s+zone\b", "string", t)
    t = re.sub(r"\btime\b(\(\d+\))?", "bigint", t)
    # timestamp precision: Spark timestamps are fixed µs — precisions > 6
    # truncate (documented), the parenthesized form is not Spark DDL
    t = re.sub(r"\btimestamp\(\d+\)(\s+with\s+time\s+zone)?", "timestamp", t)
    t = re.sub(r"\btimestamp\s+with\s+time\s+zone\b", "timestamp", t)
    return t


def _alter_table(engine, sql: str) -> DataFrame:
    m = re.match(
        rf"ALTER\s+TABLE\s+({_IDENT}(?:\.{_IDENT})*)\s+(.*)$", sql, re.IGNORECASE | re.DOTALL
    )
    if not m:
        raise ValueError(f"cannot parse ALTER TABLE: {sql[:120]}")
    name, action = _norm_name(m.group(1)), m.group(2).strip()
    au = action.upper()
    if au.startswith("EXECUTE"):
        return _table_execute(engine, name, action)
    if au.startswith("SET PROPERTIES"):
        # #setTableProperties: recorded metadata (SHOW CREATE TABLE surfaces
        # format/location; arbitrary properties are retained here).
        _require_managed(engine, name)
        props = getattr(engine, "_table_properties", None)
        if props is None:
            props = engine._table_properties = {}
        props.setdefault(name, {}).update(
            (pm.group(1).lower(), pm.group(2))
            for pm in re.finditer(r"([\w.]+)\s*=\s*'([^']*)'", action)
        )
        return engine.spark.createDataFrame([(0,)], "rows: bigint")
    dm = re.match(
        r"ALTER\s+COLUMN\s+(\w+)\s+(SET\s+DEFAULT\s+(.+)|DROP\s+DEFAULT|DROP\s+NOT\s+NULL)\s*$",
        action,
        re.IGNORECASE | re.DOTALL,
    )
    if dm:
        # #setDefaultValue / #dropDefaultValue / #dropNotNullConstraint:
        # defaults fill unmentioned columns on INSERT (the reference's
        # column-default rule); NOT NULL is not enforced by this engine, so
        # dropping it is an accepted no-op.
        _require_managed(engine, name)
        col, verb = _norm_name(dm.group(1)), dm.group(2).upper()
        defaults = getattr(engine, "_column_defaults", None)
        if defaults is None:
            defaults = engine._column_defaults = {}
        if verb.startswith("SET DEFAULT"):
            defaults[(name, col)] = dm.group(3).strip()
        elif verb.startswith("DROP DEFAULT"):
            defaults.pop((name, col), None)
        return engine.spark.createDataFrame([(0,)], "rows: bigint")
    df = _read(engine, name)
    if au.startswith("ALTER COLUMN") and "SET DATA TYPE" in au:
        # #setColumnType (SetColumnTypeTask.java; Iceberg type evolution):
        # a projection-level cast commit — widened reads, one rewrite.
        am = re.match(
            r"ALTER\s+COLUMN\s+(\w+)\s+SET\s+DATA\s+TYPE\s+(.+)$", action, re.IGNORECASE
        )
        col, typ = _norm_name(am.group(1)), _trino_type_to_spark(am.group(2))
        if col not in df.columns:
            raise ValueError(f"column not found: {col}")
        out = df.select(
            *[F.col(c).cast(typ).alias(c) if c == col else F.col(c) for c in df.columns]
        )
        _commit(engine, name, out)
        return engine.spark.createDataFrame([(0,)], "rows: bigint")
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
        if col in (getattr(engine, "_dml_layouts", {}).get(name) or []):
            # Trino table formats reject this too (the layout references it)
            raise ValueError(f"cannot drop partition column: {col}")
        out = df.drop(col)
    elif au.startswith("RENAME COLUMN"):
        am = re.match(r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", action, re.IGNORECASE)
        old, new = _norm_name(am.group(1)), _norm_name(am.group(2))
        if old not in df.columns:
            raise ValueError(f"column not found: {old}")
        layout = getattr(engine, "_dml_layouts", {}).get(name)
        if layout and old in layout:
            # keep the hive layout pointing at the renamed column
            engine._dml_layouts[name] = [new if c == old else c for c in layout]
        out = df.withColumnRenamed(old, new)
    elif au.startswith("RENAME TO"):
        new = _norm_name(action.split()[2])
        path = _require_managed(engine, name)
        newpath = os.path.join(_warehouse_dir(), new)
        os.rename(path, newpath)
        if os.path.isdir(_snap_root(name)):
            os.makedirs(os.path.dirname(_snap_root(new)), exist_ok=True)
            shutil.rmtree(_snap_root(new), ignore_errors=True)
            os.rename(_snap_root(name), _snap_root(new))
        tables = _managed(engine)
        del tables[name]
        tables[new] = newpath
        # Move the partition layout with the table; a future CREATE TABLE
        # under the old name must not inherit it.
        layouts = getattr(engine, "_dml_layouts", {})
        if name in layouts:
            layouts[new] = layouts.pop(name)
        logical = getattr(engine, "_dml_logical_cols", {})
        if name in logical:
            logical[new] = logical.pop(name)
        engine.spark.catalog.dropTempView(name)
        renamed = engine.spark.read.parquet(newpath)
        lcols = logical.get(new)
        if lcols and lcols != renamed.columns and set(lcols) == set(renamed.columns):
            renamed = renamed.select(*lcols)
        renamed.createOrReplaceTempView(new)
        refresh_infoschema(engine, changed=new, dropped=name)
        return engine.spark.createDataFrame([(0,)], "rows: bigint")
    else:
        raise ValueError(f"unsupported ALTER TABLE action: {action[:60]}")
    _commit(engine, name, out)
    return engine.spark.createDataFrame([(0,)], "rows: bigint")


def _file_count(path: str) -> int:
    return sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )


def _parse_size(txt: str) -> int:
    m = re.match(r"\s*(\d+(?:\.\d+)?)\s*(B|KB|MB|GB|TB)?\s*$", txt.strip(), re.IGNORECASE)
    if not m:
        raise ValueError(f"cannot parse size: {txt}")
    mult = {"B": 1, "KB": 2**10, "MB": 2**20, "GB": 2**30, "TB": 2**40}[
        (m.group(2) or "B").upper()
    ]
    return int(float(m.group(1)) * mult)


def _parse_duration_s(txt: str) -> float:
    m = re.match(r"\s*(\d+(?:\.\d+)?)\s*(s|m|h|d)\s*$", txt.strip(), re.IGNORECASE)
    if not m:
        raise ValueError(f"cannot parse duration: {txt}")
    return float(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(2).lower()]


def _table_execute(engine, name: str, action: str) -> DataFrame:
    """ALTER TABLE t EXECUTE <proc>(args) [WHERE pred] — the connector
    table-procedure surface (grammar #tableExecute; Iceberg's
    OptimizeTableProcedure.java / ExpireSnapshotsTableProcedure.java /
    DropExtendedStatsTableProcedure.java / RemoveOrphanFilesTableProcedure).

    ``optimize``: small-file compaction as a NEW snapshot — partitioned
    tables compact to one file per partition (repartition on the layout
    keys riding the commit's partitionBy write), unpartitioned tables to
    ceil(bytes / file_size_threshold) files. A WHERE predicate scopes the
    rewrite to affected partitions; untouched partitions are carried by
    hardlink — at 100 TB an optimize pass costs only the partitions it
    compacts, exactly like partition-scoped DELETE."""
    m = re.match(
        r"EXECUTE\s+(\w+)\s*(?:\(([^)]*)\))?\s*(?:WHERE\s+(.*))?$",
        action,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse ALTER TABLE EXECUTE: {action[:80]}")
    proc, argtxt, where = m.group(1).lower(), m.group(2) or "", m.group(3)
    args = {
        a.group(1).lower(): a.group(2)
        for a in re.finditer(r"(\w+)\s*=>\s*'([^']*)'", argtxt)
    }
    spark = engine.spark
    path = _require_managed(engine, name)
    if proc == "optimize":
        threshold = _parse_size(args.get("file_size_threshold", "128MB"))
        part_cols = getattr(engine, "_dml_layouts", {}).get(name)
        df = _read(engine, name)
        before = _file_count(path)
        if where:
            pred = F.expr(_translate_fragment(engine, where))
            scoped = _affected_partitions(engine, name, df, pred)
            if scoped is not None:
                cond, untouched = scoped
                if cond is None:  # predicate matched nothing: no-op commit
                    return spark.createDataFrame(
                        [(0, before, before)],
                        "rows: bigint, files_before: int, files_after: int",
                    )
                compacted = df.filter(cond).repartition(*[F.col(c) for c in part_cols])
                n = _commit(
                    engine, name, compacted,
                    preserve_rel_dirs=untouched, operation="optimize",
                )
                return spark.createDataFrame(
                    [(n, before, _file_count(path))],
                    "rows: bigint, files_before: int, files_after: int",
                )
            # unpartitioned (or flat): WHERE cannot scope — full rewrite
        if part_cols:
            compacted = df.repartition(*[F.col(c) for c in part_cols])
        else:
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
            target = max(1, -(-size // threshold))  # ceil
            compacted = df.repartition(int(target))
        n = _commit(engine, name, compacted, operation="optimize")
        return spark.createDataFrame(
            [(n, before, _file_count(path))],
            "rows: bigint, files_before: int, files_after: int",
        )
    if proc == "expire_snapshots":
        horizon = _parse_duration_s(args.get("retention_threshold", "7d"))
        cutoff = _dt.datetime.now(_dt.timezone.utc).timestamp() - horizon
        log = _read_log(name)
        current = max((e["version"] for e in log), default=0)
        expired = 0
        for e in log:
            if e.get("expired") or e["version"] == current:
                continue
            if e["committed_at"] <= cutoff:
                shutil.rmtree(
                    os.path.join(_snap_root(name), f"v{e['version']:05d}"),
                    ignore_errors=True,
                )
                e["expired"] = True
                expired += 1
        _write_log(name, log)
        return spark.createDataFrame([(expired,)], "expired_snapshots: bigint")
    if proc == "drop_extended_stats":
        getattr(engine, "_stats_cache", {}).pop(name, None)
        return spark.createDataFrame([(name,)], "table: string")
    if proc == "remove_orphan_files":
        parent, base = os.path.dirname(path), os.path.basename(path)
        removed = 0
        if os.path.isdir(parent):
            for d in os.listdir(parent):
                if d.startswith((f"{base}.staging-", f"{base}.old-")):
                    shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
                    removed += 1
        return spark.createDataFrame([(removed,)], "removed_dirs: bigint")
    raise ValueError(f"unknown table procedure: {proc}")


def refresh_infoschema(engine, changed: str | None = None, dropped: str | None = None) -> None:
    """Re-register information_schema views to include engine-created
    tables and views (the reference's information_schema reflects DDL
    immediately — InformationSchemaMetadata.java).

    Incremental: the per-table schema dict is cached on the engine and
    only the changed/dropped entry is recomputed — a DML statement must
    not pay a full catalog schema scan per commit."""
    from trino_spark.infoschema import register_information_schema

    # mutations invalidate ANALYZE-collected statistics for the table
    stats = getattr(engine, "_stats_cache", None)
    if stats is not None:
        if changed is not None:
            stats.pop(changed, None)
        if dropped is not None:
            stats.pop(dropped, None)
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
