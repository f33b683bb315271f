"""TrinoEngine: the `engine.sql(trino_sql)` entry point.

Role-equivalent to the reference's dispatch path (SQL text in →
DispatchManager.createQueryInternal → parse → analyze → plan → execute,
core/trino-main/.../dispatcher/DispatchManager.java:208) collapsed onto
Spark: dialect-translate, then let Catalyst do analysis/optimization and
Tungsten execute. See SURVEY.md §3.1.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from trino_spark.catalog import ALL_TABLES, Catalog
from trino_spark.dialect import routines as _routines_mod
from trino_spark.dialect.rewrites import translate
from trino_spark.infoschema import register_information_schema, rewrite_show

__all__ = ["TrinoEngine", "translate"]


class TrinoEngine:
    """Trino-dialect SQL in, DataFrame out."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        import threading

        self.spark = spark
        self.catalog = Catalog(spark)
        # Per-thread statement depth: the HTTP server dispatches concurrent
        # statements onto one shared engine, so a process-wide counter
        # would corrupt the "is this a top-level statement?" decisions
        # (query events, CTE-cache retirement) across threads.
        self._tls = threading.local()
        # Guards the reused-CTE cache (dialect/cte.py): retire() must not
        # drop another in-flight statement's views between its SQL rewrite
        # and Catalyst analysis. RLock + in-flight top-level count.
        self._cte_lock = threading.RLock()
        self._cte_active = 0
        self._cte_cached: list = []
        # SQL routines (CREATE FUNCTION ... RETURN expr), inlined as macros
        # per dialect/routines.py (reference: SqlRoutinePlanner inlining).
        self.routines: dict[str, _routines_mod.Routine] = {}
        # Control-flow / LANGUAGE PYTHON routines, registered as Spark UDFs
        # (reference: SqlRoutineCompiler.java bytecode path + PythonEngine).
        self.python_routines: dict[str, _routines_mod.PythonRoutine] = {}
        # Prepared statements (PREPARE/EXECUTE/DEALLOCATE; PrepareTask.java).
        self.prepared: dict[str, str] = {}
        # SET SESSION properties (SystemSessionProperties.java surface).
        self.session_properties: dict[str, str] = {}
        # Materialized views: name -> defining Trino SQL. Data lives as
        # parquet under spark-warehouse/mv/<name>; queries read the STORED
        # data (stale until REFRESH), matching the reference's semantics
        # (core/.../RefreshMaterializedViewOperator.java, docs
        # sql/create-materialized-view.md).
        self.materialized_views: dict[str, str] = {}
        # Freshness metadata per MV (reference: the freshness /
        # last_fresh_time columns of system.metadata.materialized_views,
        # core/.../connector/system/MaterializedViewSystemTable.java):
        # source-table fingerprints captured at refresh time.
        self._mv_meta: dict[str, dict] = {}
        if sf_dir:
            from trino_spark.catalog import load as _load

            self.catalog.register_parquet_dir(sf_dir, ALL_TABLES)
            # schema via the session-cached loader (catalog.load): the
            # StructType is memoized on the cached DataFrame, so repeat
            # engine constructions skip 10 py4j schema round-trips
            schemas = {
                name: [
                    (f.name, f.dataType.simpleString())
                    for f in _load(spark, sf_dir, name).schema
                ]
                for name in ALL_TABLES
            }
            register_information_schema(spark, schemas)
        # Function/PTF registration is session-global and idempotent —
        # ~190 spark.udf.register calls cost ~1.3 s of py4j round-trips,
        # so do it once per SparkSession, not once per engine (the
        # reference registers SystemFunctionBundle once at server boot,
        # not per query).
        if not getattr(spark, "_ts_fns_registered", False):
            from trino_spark.dialect import ptf as _ptf

            _ptf.register_builtin_table_functions(spark)
            # Python-bodied scalar residue (normalize/word_stem/base32/
            # hmac/CDFs) so those names resolve from SQL text — the
            # SystemFunctionBundle registration analog.
            from trino_spark.functions.registry import (
                register_sql_functions,
                register_sql_functions_r4,
                register_sql_functions_r5,
            )

            register_sql_functions(spark)
            register_sql_functions_r4(spark)
            register_sql_functions_r5(spark)
            from trino_spark.functions.sqlagg import register_sql_aggregates

            register_sql_aggregates(spark)
            from trino_spark.functions.geosql import register_geo_functions

            register_geo_functions(spark)
            spark._ts_fns_registered = True

    def sql(self, trino_sql: str) -> DataFrame:
        """Dispatch a Trino-dialect statement; top-level calls are recorded
        in the query log served as system.runtime.queries
        (core/.../connector/system/QuerySystemTable.java role)."""
        import time
        import uuid as _uuid

        depth = getattr(self._tls, "depth", 0)
        self._tls.depth = depth + 1
        if depth == 0:
            with self._cte_lock:
                self._cte_active += 1
        t0 = time.perf_counter()
        qid = _uuid.uuid4().hex[:16]
        if depth == 0:
            self.emit_event(
                "query_created",
                {
                    "query_id": qid,
                    "query": trino_sql.strip()[:1000],
                    "user": getattr(self, "session_user", "trino"),
                    "create_time": time.time(),
                },
            )
        try:
            out = self._sql_inner(trino_sql)
            if depth == 0:
                dt = time.perf_counter() - t0
                self._log_query(qid, trino_sql, "FINISHED", dt)
                self._emit_completed(qid, trino_sql, "FINISHED", dt, None)
            return out
        except Exception as exc:
            if depth == 0:
                dt = time.perf_counter() - t0
                self._log_query(qid, trino_sql, "FAILED", dt)
                self._emit_completed(
                    qid, trino_sql, "FAILED", dt, str(exc).split("\n")[0][:500]
                )
            raise
        finally:
            self._tls.depth = depth
            if depth == 0:
                with self._cte_lock:
                    self._cte_active -= 1

    # ---- EventListener SPI (io.trino.spi.eventlistener.EventListener:
    # queryCreated/queryCompleted; listeners are isolated — a throwing
    # listener never fails the query, as in the reference's dedicated
    # listener executor). A listener is an object with `query_created` /
    # `query_completed` methods (either optional) or a plain callable
    # receiving (kind, event).
    def add_event_listener(self, listener) -> None:
        if not hasattr(self, "_event_listeners"):
            self._event_listeners: list = []
        self._event_listeners.append(listener)

    def remove_event_listener(self, listener) -> None:
        try:
            getattr(self, "_event_listeners", []).remove(listener)
        except ValueError:
            pass

    def emit_event(self, kind: str, event: dict) -> None:
        for ls in getattr(self, "_event_listeners", []):
            try:
                fn = getattr(ls, kind, None)
                if fn is not None:
                    fn(dict(event))
                elif callable(ls):
                    ls(kind, dict(event))
            except Exception:
                pass  # never let a listener break the query path

    def _emit_completed(
        self, qid: str, sql: str, state: str, elapsed_s: float, error: str | None
    ) -> None:
        self.emit_event(
            "query_completed",
            {
                "query_id": qid,
                "query": sql.strip()[:1000],
                "user": getattr(self, "session_user", "trino"),
                "state": state,
                "wall_ms": round(elapsed_s * 1000, 3),
                "error": error,
            },
        )

    def _log_query(self, qid: str, sql: str, state: str, elapsed_s: float) -> None:
        import datetime as _dt

        log = getattr(self, "_query_log", None)
        if log is None:
            log = self._query_log = []
        end = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        created = end - _dt.timedelta(seconds=elapsed_s)
        log.append(
            (
                qid,
                state,
                getattr(self, "session_user", "trino"),
                sql.strip()[:1000],
                round(elapsed_s * 1000, 3),
                created,
                created,  # started: dispatch is immediate in this engine
                end,
            )
        )
        del log[:-200]  # bounded, like the reference's history window

    @staticmethod
    def _sub_outside_literals(sql: str, target: str, repl: str) -> str:
        """Replace `target` only OUTSIDE single-quoted string literals —
        a raw str.replace would corrupt e.g. SELECT 'system.runtime.nodes'."""
        from trino_spark.dialect.access import map_outside_literals

        return map_outside_literals(sql, lambda p: p.replace(target, repl))

    @staticmethod
    def _first_keyword(sql: str) -> str:
        """First WORD token of the statement, uppercased — skips leading
        whitespace, comments, and parentheses, so statement-type dispatch
        cannot be fooled by '(SELECT ...' or '/* c */ SELECT ...'."""
        from trino_spark.dialect.tokenizer import tokenize

        for t in tokenize(sql):
            if t.kind == "WORD":
                return t.text.upper()
            if t.kind == "WS" or (t.kind == "SYM" and t.text == "("):
                continue
            break
        return ""

    def _sql_inner(self, trino_sql: str) -> DataFrame:
        from trino_spark.dialect import prepared as _prep

        if "@" in trino_sql and getattr(self, "dml_tables", None):
            # Branch refs t@b (grammar SqlBase.g4:80,221; Iceberg branch
            # semantics): resolve BEFORE time travel so `t@b FOR VERSION
            # AS OF n` pins a snapshot of the branch fork.
            from trino_spark.dialect import branches as _branches

            trino_sql = _branches.resolve(self, trino_sql)
        if re.search(r"\bCURRENT_USER\b", trino_sql, re.IGNORECASE):
            # CURRENT_USER (#currentUser) reflects SET SESSION AUTHORIZATION
            # — substituted as a literal outside string literals.
            from trino_spark.dialect.access import map_outside_literals

            _user = getattr(self, "session_user", "trino").replace("'", "''")
            trino_sql = map_outside_literals(
                trino_sql,
                lambda p: re.sub(r"\bCURRENT_USER\b", f"'{_user}'", p, flags=re.IGNORECASE),
            )
        if re.search(r"\bversion\s*\(\s*\)", trino_sql, re.IGNORECASE):
            # version() (#version, ServerInfoResource analog): the engine
            # release string as a literal, like the reference's scalar.
            from trino_spark import __version__
            from trino_spark.dialect.access import map_outside_literals

            trino_sql = map_outside_literals(
                trino_sql,
                lambda p: re.sub(
                    r"\bversion\s*\(\s*\)", f"'{__version__}'", p, flags=re.IGNORECASE
                ),
            )
        if re.search(r"\bcurrent_schema\b(?!\s*[.(])", trino_sql, re.IGNORECASE):
            # current_schema niladic: the engine's own USE-tracked schema
            # (the translate() fallback maps it to current_database() for
            # raw spark.sql callers)
            from trino_spark.dialect.access import map_outside_literals

            _sch = getattr(self, "_current_schema", "default")
            trino_sql = map_outside_literals(
                trino_sql,
                lambda p: re.sub(
                    r"\bcurrent_schema\b(?!\s*[.(])",
                    lambda _m: "'" + _sch.replace("'", "''") + "'",
                    p,
                    flags=re.IGNORECASE,
                ),
            )
        if re.search(r"\bcurrent_groups\s*\(\s*\)", trino_sql, re.IGNORECASE):
            # current_groups() (#currentGroups): the identity's group set.
            # Our session identity model is roles, so the group list is the
            # active role (empty for the unrestricted owner session).
            from trino_spark.dialect.access import map_outside_literals

            _role = getattr(self, "_acl", {}).get("current")
            _lit = (
                "array('" + _role.replace("'", "''") + "')"
                if _role
                else "CAST(array() AS ARRAY<STRING>)"
            )
            trino_sql = map_outside_literals(
                trino_sql,
                lambda p: re.sub(
                    # replacement via lambda: a role containing backslashes
                    # must not be parsed for group references
                    r"\bcurrent_groups\s*\(\s*\)",
                    lambda _m: _lit,
                    p,
                    flags=re.IGNORECASE,
                ),
            )
        if re.search(r"\bFOR\s+(?:VERSION|TIMESTAMP)\s+AS\s+OF\b", trino_sql, re.IGNORECASE):
            # Time travel (grammar SqlBase.g4 queryPeriod; Iceberg/Delta
            # connector behavior): pin table refs to snapshot versions.
            from trino_spark.dialect import dml as _dml

            trino_sql = _dml.resolve_time_travel(self, trino_sql)
        if getattr(self, "catalogs", None):
            # Dynamic catalog mounts (CREATE CATALOG; CatalogFactory.java):
            # cat.schema.table refs resolve to lazily-registered views
            # (jdbc mounts resolve natively through Spark's DSv2 catalog).
            from trino_spark.dialect import catalogs as _cats

            trino_sql = _cats.resolve(self, trino_sql)
        if any(
            k in trino_sql
            for k in ("$snapshots", "$history", "$files", "$partitions", "$refs", "$properties")
        ):
            # Iceberg-style metadata tables over the snapshot log / current
            # table directory (SnapshotsTable / HistoryTable / FilesTable /
            # PartitionsTable analogs).
            from trino_spark.dialect import dml as _dml

            trino_sql = _dml.resolve_metadata_tables(self, trino_sql)
        if "system.runtime.nodes" in trino_sql:
            # system.runtime.nodes (NodesSystemTable.java): one coordinator
            # row in local mode; on a real cluster this would enumerate
            # executors.
            sc = self.spark.sparkContext
            self.spark.createDataFrame(
                [(sc.applicationId, sc.master, sc.version, True, "active")],
                "node_id: string, http_uri: string, node_version: string, coordinator: boolean, state: string",
            ).createOrReplaceTempView("_system_runtime_nodes")
            trino_sql = self._sub_outside_literals(
                trino_sql, "system.runtime.nodes", "_system_runtime_nodes"
            )
        for _dotted in ("information_schema.tables", "information_schema.columns"):
            if _dotted in trino_sql:
                # The catalog loader registers these as flat views
                # (infoschema.py register_information_schema); dotted SQL
                # references resolve here (InformationSchemaPageSource).
                trino_sql = self._sub_outside_literals(
                    trino_sql, _dotted, _dotted.replace(".", "_")
                )
        if "information_schema.views" in trino_sql:
            # information_schema.views: the engine's logical views + MVs
            # (InformationSchemaPageSource.java VIEWS table).
            rows = [(n, d, "VIEW") for n, d in sorted(getattr(self, "views", {}).items())] + [
                (n, d, "MATERIALIZED VIEW") for n, d in sorted(self.materialized_views.items())
            ]
            self.spark.createDataFrame(
                rows or [], "table_name: string, view_definition: string, view_type: string"
            ).createOrReplaceTempView("_information_schema_views")
            trino_sql = self._sub_outside_literals(
                trino_sql, "information_schema.views", "_information_schema_views"
            )
        if "system.runtime.tasks" in trino_sql:
            # TaskSystemTable.java: live execution tasks. Local mode maps
            # Spark's active stages — one row per (stage, running tasks).
            sc = self.spark.sparkContext
            st = sc.statusTracker()
            rows = []
            for sid in st.getActiveStageIds():
                info = st.getStageInfo(sid)
                if info:
                    rows.append(
                        (
                            sc.applicationId,
                            f"stage-{sid}",
                            "RUNNING",
                            int(info.numTasks),
                            int(info.numActiveTasks),
                            int(info.numCompletedTasks),
                            int(info.numFailedTasks),
                        )
                    )
            self.spark.createDataFrame(
                rows or [],
                "node_id: string, task_id: string, state: string, splits: int,"
                " running_splits: int, completed_splits: int, failed_splits: int",
            ).createOrReplaceTempView("_system_runtime_tasks")
            trino_sql = self._sub_outside_literals(
                trino_sql, "system.runtime.tasks", "_system_runtime_tasks"
            )
        for _prop_tbl, _props in (
            ("table_properties", [("format", "varchar", "PARQUET", "File format"),
                                  ("location", "varchar", "", "Storage location"),
                                  ("partitioned_by", "array(varchar)", "[]", "Partition columns"),
                                  ("bucketed_by", "array(varchar)", "[]", "Bucketing columns"),
                                  ("bucket_count", "integer", "0", "Number of buckets")]),
            ("schema_properties", [("location", "varchar", "", "Storage location")]),
            ("column_properties", []),
            ("analyze_properties", [("columns", "array(varchar)", "[]", "Columns to analyze")]),
            ("materialized_view_properties", [("storage_schema", "varchar", "", "Storage schema")]),
        ):
            key = f"system.metadata.{_prop_tbl}"
            if key in trino_sql:
                # {Schema,Table,Column,Analyze,MaterializedView}Properties
                # SystemTable.java: the property names each catalog accepts
                rows = [("spark", n, t, d, desc) for n, t, d, desc in _props]
                self.spark.createDataFrame(
                    rows or [],
                    "catalog_name: string, property_name: string, type: string,"
                    " default_value: string, description: string",
                ).createOrReplaceTempView(f"_system_metadata_{_prop_tbl}")
                trino_sql = self._sub_outside_literals(
                    trino_sql, key, f"_system_metadata_{_prop_tbl}"
                )
        if "system.metadata.catalogs" in trino_sql:
            # CatalogSystemTable.java: the session catalog + dynamic mounts
            rows = [("spark", "spark")] + [
                (name, mount["connector"])
                for name, mount in sorted(getattr(self, "catalogs", {}).items())
            ]
            self.spark.createDataFrame(
                rows, "catalog_name: string, connector_name: string"
            ).createOrReplaceTempView("_system_metadata_catalogs")
            trino_sql = self._sub_outside_literals(
                trino_sql, "system.metadata.catalogs", "_system_metadata_catalogs"
            )
        if "system.metadata.materialized_views" in trino_sql:
            # MaterializedViewSystemTable.java: name/definition/freshness
            rows = [
                (
                    n,
                    self.materialized_views[n],
                    self._mv_freshness(n),
                )
                for n in sorted(self.materialized_views)
            ]
            self.spark.createDataFrame(
                rows or [], "name: string, definition: string, freshness: string"
            ).createOrReplaceTempView("_system_metadata_mvs")
            trino_sql = self._sub_outside_literals(
                trino_sql, "system.metadata.materialized_views", "_system_metadata_mvs"
            )
        for _jt, _src in (
            ("system.jdbc.tables",
             "SELECT 'spark' AS table_cat, table_schema AS table_schem,"
             " table_name, 'TABLE' AS table_type FROM information_schema_tables"),
            ("system.jdbc.schemas",
             "SELECT DISTINCT table_schema AS table_schem, 'spark' AS table_catalog"
             " FROM information_schema_tables"),
            ("system.jdbc.columns",
             "SELECT 'spark' AS table_cat, table_schema AS table_schem,"
             " table_name, column_name, data_type AS type_name,"
             " ordinal_position FROM information_schema_columns"),
            ("system.jdbc.table_types",
             "SELECT explode(array('TABLE', 'VIEW')) AS table_type"),
            ("system.jdbc.catalogs", "SELECT 'spark' AS table_cat"),
        ):
            if _jt in trino_sql:
                # the system.jdbc schema (JdbcSystemTables serving JDBC
                # driver DatabaseMetaData): projected off information_schema
                view = "_" + _jt.replace(".", "_")
                self.spark.sql(_src).createOrReplaceTempView(view)
                trino_sql = self._sub_outside_literals(trino_sql, _jt, view)
        if "system.jdbc.types" in trino_sql:
            # JdbcTypesSystemTable (system.jdbc schema serving JDBC driver
            # metadata): type_name + java.sql.Types DATA_TYPE codes
            rows = [
                ("boolean", 16), ("tinyint", -6), ("smallint", 5),
                ("integer", 4), ("bigint", -5), ("real", 7),
                ("double", 8), ("decimal", 3), ("varchar", 12),
                ("char", 1), ("varbinary", -3), ("date", 91),
                ("time", 92), ("timestamp", 93),
                ("timestamp with time zone", 2014), ("array", 2003),
                ("map", 2000), ("row", 2002), ("json", 2000),
            ]
            self.spark.createDataFrame(
                rows, "type_name: string, data_type: int"
            ).createOrReplaceTempView("_system_jdbc_types")
            trino_sql = self._sub_outside_literals(
                trino_sql, "system.jdbc.types", "_system_jdbc_types"
            )
        if "system.runtime.queries" in trino_sql:
            # system.runtime.queries (QuerySystemTable.java): planning-time
            # dispatch state per recorded query.
            rows = list(getattr(self, "_query_log", []))
            self.spark.createDataFrame(
                rows or [],
                "query_id: string, state: string, user: string, query: string,"
                " elapsed_ms: double, created: timestamp, started: timestamp,"
                " `end`: timestamp",
            ).createOrReplaceTempView("_system_runtime_queries")
            trino_sql = self._sub_outside_literals(
                trino_sql, "system.runtime.queries", "_system_runtime_queries"
            )

        wf = re.match(
            r"\s*WITH\s+(FUNCTION\s+.*?)\s+(SELECT|VALUES)\b(.*)$",
            trino_sql,
            re.IGNORECASE | re.DOTALL,
        ) if "FUNCTION" in trino_sql.upper()[:20] else None
        if wf:
            # Inline SQL routines (grammar SqlBase.g4 queryWith ->
            # functionSpecification; docs udf/sql): expression-bodied
            # functions scoped to this one query — parsed with the
            # CREATE FUNCTION machinery, macro-inlined, then discarded.
            inline: dict = {}
            for spec_txt in re.split(r",\s*(?=FUNCTION\b)", wf.group(1), flags=re.IGNORECASE):
                r = _routines_mod.parse_create_function("CREATE " + spec_txt.strip())
                if r is None or isinstance(r, _routines_mod.PythonRoutine):
                    raise ValueError(
                        "WITH FUNCTION supports expression-bodied SQL routines only"
                    )
                inline[r.name] = r
            query = f"{wf.group(2)}{wf.group(3)}"
            expanded = _routines_mod.expand(query, {**self.routines, **inline})
            return self.sql(expanded)
        prep = _prep.parse_prepare(trino_sql)
        if prep is not None:
            name, body = prep
            self.prepared[name] = body
            return self.spark.createDataFrame([(name.lower(),)], "prepared: string")
        dealloc = _prep.parse_deallocate(trino_sql)
        if dealloc is not None:
            self.prepared.pop(dealloc, None)
            return self.spark.createDataFrame([(dealloc.lower(),)], "prepared: string")
        imm = _prep.parse_execute_immediate(trino_sql)
        if imm is not None:
            stmt, args = imm
            return self.sql(_prep.bind(stmt, args))
        execed = _prep.parse_execute(trino_sql)
        if execed is not None:
            name, args = execed
            if name not in self.prepared:
                raise ValueError(f"prepared statement not found: {name}")
            return self.sql(_prep.bind(self.prepared[name], args))
        up0 = trino_sql.upper().split()[:3]
        if up0 == ["SHOW", "CREATE", "FUNCTION"]:
            # #showCreateFunction: render the stored definition text.
            fname = trino_sql.split()[3].strip('"').rstrip(";").lower()
            src = getattr(self, "_function_sources", {}).get(fname.upper())
            if src is None:
                raise ValueError(f"function not found: {fname}")
            return self.spark.createDataFrame([(src,)], "create_function: string")
        if up0[:2] == ["SET", "PATH"]:
            # #setPath (SetPathTask.java): recorded; the engine's single
            # function namespace makes it a session attribute only.
            self.sql_path = trino_sql.split(None, 2)[2].strip().rstrip(";")
            return self.spark.createDataFrame([(self.sql_path,)], "path: string")
        routine = _routines_mod.parse_create_function(trino_sql)
        if routine is not None:
            if not hasattr(self, "_function_sources"):
                self._function_sources = {}
            self._function_sources[routine.name.upper()] = trino_sql.strip().rstrip(";")
            if isinstance(routine, _routines_mod.PythonRoutine):
                # Row-interpreted path (loops / LANGUAGE PYTHON): a real UDF.
                # Spark resolves the registered name during analysis, so no
                # macro expansion is needed (or possible) for these.
                self.python_routines[routine.name] = routine
                self.spark.udf.register(routine.name.lower(), routine.fn, routine.returns)
            else:
                self.routines[routine.name] = routine
            return self.spark.createDataFrame([(routine.name.lower(),)], "function: string")
        dropped = _routines_mod.parse_drop_function(trino_sql)
        if dropped is not None:
            self.routines.pop(dropped, None)
            self.python_routines.pop(dropped, None)
            getattr(self, "_function_sources", {}).pop(dropped.upper(), None)
            return self.spark.createDataFrame([(dropped.lower(),)], "function: string")
        stripped = trino_sql.strip().rstrip(";")
        up = stripped.upper().split()
        # Access control + comments (AccessControl SPI / CommentTask.java):
        # role statements handled here; every other statement is checked
        # against the active role's grants before dispatch.
        from trino_spark.dialect import access as _access

        acl_out = _access.try_execute(self, stripped)
        if acl_out is None and up[:1] == ["CALL"]:
            acl_out = _access.try_execute_call(self, stripped)
        if acl_out is not None:
            return acl_out
        _access.enforce(self, stripped)
        if self._first_keyword(stripped) in ("SELECT", "WITH", "VALUES", "TABLE"):
            # Row filters / column masks (ConnectorAccessControl
            # getRowFilters/getColumnMasks): reads under an active role see
            # secured views. DML reads recurse through this dispatch, so
            # their SELECT halves are covered too. Detection is token-based
            # — a leading '(', comment, or whitespace must not let a read
            # bypass the security rewrite.
            trino_sql = stripped = _access.apply_security(self, stripped)
        if (up and up[0] in ("CREATE", "DROP", "ALTER") and "BRANCH" in up[:4]) or up[:2] == ["SHOW", "BRANCHES"]:
            # Branch statements (grammar #createBranch/#dropBranch/
            # #fastForwardBranch/#showBranches): write-audit-publish over
            # the snapshot log.
            from trino_spark.dialect import branches as _branches

            br_out = _branches.try_execute(self, stripped)
            if br_out is not None:
                return br_out
        if up[:1] in (["INSERT"], ["DELETE"], ["UPDATE"], ["MERGE"], ["TRUNCATE"], ["ALTER"]) or (
            up[:2]
            in (
                ["CREATE", "TABLE"],
                ["DROP", "TABLE"],
                ["CREATE", "VIEW"],
                ["DROP", "VIEW"],
                ["CREATE", "SCHEMA"],
                ["DROP", "SCHEMA"],
            )
            or up[:3]
            in (
                ["CREATE", "OR", "REPLACE"],
                ["SHOW", "CREATE", "VIEW"],
                ["SHOW", "CREATE", "SCHEMA"],
            )
        ):
            # DML/DDL entry point (SURVEY §3.3): copy-on-write managed
            # tables, logical views, column evolution. Catalog-qualified
            # targets route to the mounted connector's page-sink analog
            # (memory stores, blackhole swallows) first.
            from trino_spark.dialect import dml as _dml

            if getattr(self, "catalogs", None):
                from trino_spark.dialect import catalogs as _cats

                cat_dml = _cats.try_execute_dml(self, stripped)
                if cat_dml is not None:
                    return cat_dml
            dml_out = _dml.try_execute(self, stripped)
            if dml_out is None:
                dml_out = _dml.try_execute_ddl(self, stripped)
            if dml_out is not None:
                return dml_out
        if up[:3] == ["CREATE", "MATERIALIZED", "VIEW"] or up[:5] == [
            "CREATE", "OR", "REPLACE", "MATERIALIZED", "VIEW",
        ]:
            skip = 3 if up[1] == "MATERIALIZED" else 5
            rest = stripped.split(None, skip)[skip]
            name, _, defn = rest.partition(" AS ") if " AS " in rest else rest.partition(" as ")
            name = name.strip().strip('"').split(".")[-1].lower()
            if not defn.strip():
                raise ValueError(f"CREATE MATERIALIZED VIEW {name}: missing AS <query>")
            self.materialized_views[name] = defn.strip()
            self._mv_refresh(name)
            return self.spark.createDataFrame([(name,)], "materialized_view: string")
        if up[:3] == ["REFRESH", "MATERIALIZED", "VIEW"]:
            name = stripped.split()[3].strip('"').split(".")[-1].lower()
            if name not in self.materialized_views:
                raise ValueError(f"materialized view not found: {name}")
            n = self._mv_refresh(name)
            return self.spark.createDataFrame([(name, n)], "materialized_view: string, rows: bigint")
        if up[:3] == ["DROP", "MATERIALIZED", "VIEW"]:
            parts = stripped.split()
            idx = 5 if len(parts) > 5 and parts[3].upper() == "IF" else 3
            name = parts[idx].strip('"').split(".")[-1].lower()
            self.materialized_views.pop(name, None)
            self._mv_meta.pop(name, None)
            self.spark.catalog.dropTempView(name)
            return self.spark.createDataFrame([(name,)], "materialized_view: string")
        if up[:2] == ["SHOW", "SCHEMAS"] and getattr(self, "schemas", None):
            # CREATE SCHEMA-registered schemas union the table namespace
            # (#showSchemas; the flat namespace maps to 'default').
            rows = sorted(set(self.schemas) | {"default"})
            return self.spark.createDataFrame([(s,) for s in rows], "schema_name: string")
        if up[:2] == ["SHOW", "CATALOGS"]:
            # Session catalog + dynamic mounts (ShowQueriesRewrite.java).
            from trino_spark.dialect import catalogs as _cats

            return _cats.show_catalogs(self, stripped)
        if up[:2] in (["CREATE", "CATALOG"], ["DROP", "CATALOG"]):
            # Dynamic catalogs (grammar SqlBase.g4 #createCatalog /
            # #dropCatalog; CreateCatalogTask.java via CatalogFactory).
            from trino_spark.dialect import catalogs as _cats

            cat_out = _cats.try_execute(self, stripped)
            if cat_out is not None:
                return cat_out
        if up[:2] == ["SHOW", "SESSION"]:
            # SET SESSION properties recorded on this engine
            # (SystemSessionProperties.java surface).
            rows = sorted(self.session_properties.items())
            return self.spark.createDataFrame(rows or [], "name: string, value: string")
        if up[:2] == ["SHOW", "FUNCTIONS"]:
            # SHOW FUNCTIONS (ShowQueriesRewrite.java): the engine's
            # function inventory — dialect-mapped Trino names plus every
            # user-registered routine. Spark-native passthrough names
            # (shared spellings like abs/concat/sum) are not enumerated.
            from trino_spark.dialect import rewrites as _rw

            udfs = sorted(
                f.name
                for f in self.spark.catalog.listFunctions()
                # Spark marks builtins isTemporary too; they resolve to
                # catalyst expression classes, while session-registered
                # UDFs carry an UDFRegistration/UserDefined class or none.
                if f.isTemporary
                and "." not in f.name
                and not (f.className or "").startswith(
                    ("org.apache.spark.sql.catalyst.", "org.apache.spark.sql.execution.")
                )
            )
            rows = (
                [(n, "scalar", "dialect-rename") for n in sorted(_rw._RENAME)]
                + [(n, "scalar", "dialect-template") for n in sorted(_rw._TEMPLATE)]
                + [(n, "scalar", "registered-udf") for n in udfs]
                + [(n.lower(), "routine", "sql") for n in sorted(self.routines)]
                + [(n.lower(), "routine", "python") for n in sorted(self.python_routines)]
            )
            return self.spark.createDataFrame(
                rows, "function_name: string, kind: string, source: string"
            )
        if up[:3] == ["SHOW", "MATERIALIZED", "VIEWS"]:
            # Freshness surface of system.metadata.materialized_views
            # (MaterializedViewSystemTable.java): FRESH iff every source
            # table's on-disk fingerprint still matches the one captured at
            # refresh; UNKNOWN for non-filesystem sources (e.g. jdbc).
            rows = [
                (n, self._mv_freshness(n), self._mv_meta[n]["last_fresh_time"])
                for n in sorted(self.materialized_views)
            ]
            return self.spark.createDataFrame(
                rows or [], "name: string, freshness: string, last_fresh_time: string"
            )
        if up[:1] == ["EXPLAIN"]:
            # EXPLAIN [ANALYZE] [(TYPE ...)] <stmt> (ExplainRewrite.java):
            # returns the rendered plan as a one-column relation. TYPE maps
            # onto Spark's explain modes: LOGICAL -> extended (analyzed +
            # optimized logical), DISTRIBUTED -> formatted physical (stage/
            # exchange structure), VALIDATE -> analysis only, IO -> scanned
            # relations summary.
            rest = stripped.split(None, 1)[1]
            mode = "formatted"
            fmt = "TEXT"
            import re as _re2

            tm = _re2.match(
                r"\(\s*((?:(?:TYPE|FORMAT)\s+\w+\s*,?\s*)+)\)\s*(.*)$",
                rest,
                _re2.IGNORECASE | _re2.DOTALL,
            )
            if tm:
                opts = {
                    k.upper(): v.upper()
                    for k, v in _re2.findall(
                        r"(TYPE|FORMAT)\s+(\w+)", tm.group(1), _re2.IGNORECASE
                    )
                }
                rest = tm.group(2)
                fmt = opts.get("FORMAT", "TEXT")
                if fmt not in ("TEXT", "JSON"):
                    raise ValueError(f"EXPLAIN (FORMAT {fmt}) not supported")
                ttype = opts.get("TYPE", "DISTRIBUTED")
                mode = {
                    "LOGICAL": "extended",
                    "DISTRIBUTED": "formatted",
                    "VALIDATE": "validate",
                    "IO": "io",
                }.get(ttype)
                if mode is None:
                    raise ValueError(f"EXPLAIN (TYPE {ttype}) not supported")
                if fmt == "JSON" and mode in ("validate",):
                    raise ValueError("EXPLAIN (FORMAT JSON) supports TYPE LOGICAL/DISTRIBUTED/IO")
            if fmt == "JSON" and up[1:2] != ["ANALYZE"] and mode != "validate":
                # ExplainRewrite's JSON rendering: emit Spark's own plan
                # JSON (TreeNode.toJSON) for the requested plan level
                df = self.sql(rest)
                qe = df._jdf.queryExecution()
                if mode == "extended":
                    text = qe.optimizedPlan().toJSON()
                elif mode == "io":
                    import json as _json

                    plan = qe.optimizedPlan().toString()
                    rels = sorted(set(_re2.findall(r"FileScan \S+|Relation \[[^\]]*\] \w+", plan)))
                    text = _json.dumps({"inputTableColumnInfos": rels})
                else:
                    text = qe.executedPlan().toJSON()
                return self.spark.createDataFrame([(text,)], "query_plan: string")
            if up[1:2] == ["ANALYZE"]:
                text = self.explain_analyze(rest.split(None, 1)[1])
            elif mode == "validate":
                self.sql(rest).schema  # analysis only; no execution
                text = "VALID"
            elif mode == "io":
                df = self.sql(rest)
                plan = df._jdf.queryExecution().optimizedPlan().toString()
                import re as _re3

                rels = sorted(set(_re3.findall(r"Relation \[[^\]]*\] \w+|FileScan \S+", plan))) or [
                    ln.strip() for ln in plan.splitlines() if "Relation" in ln
                ]
                text = "\n".join(rels) if rels else plan
            else:
                text = self.explain(rest, mode=mode)
            return self.spark.createDataFrame([(text,)], "query_plan: string")
        if up[:1] == ["DESCRIBE"] and len(up) == 2:
            # DESCRIBE <table> == SHOW COLUMNS FROM <table> (the reference
            # rewrites it the same way, ShowQueriesRewrite.java).
            shown = rewrite_show(f"SHOW COLUMNS FROM {stripped.split()[1]}")
            return self.spark.sql(shown)
        if up[:3] == ["SET", "TIME", "ZONE"]:
            # SET TIME ZONE (grammar SqlBase.g4; SetTimeZoneTask.java):
            # maps onto Spark's session timezone, which drives timestamp
            # rendering and AT TIME ZONE defaults. LOCAL restores UTC
            # (this engine's canonical zone, session.py).
            arg = stripped.split(None, 3)[3].strip()
            zone = "UTC" if arg.upper() == "LOCAL" else arg.strip("'")
            self.spark.conf.set("spark.sql.session.timeZone", zone)
            return self.spark.createDataFrame([(zone,)], "time_zone: string")
        if up[:1] == ["USE"] and len(up) == 2:
            # USE catalog.schema (UseTask.java): single-catalog engine —
            # record the default schema; unqualified names already resolve
            # against the session catalog.
            self._current_schema = stripped.split()[1].strip('"')
            return self.spark.createDataFrame([(self._current_schema,)], "schema: string")
        if up[:3] == ["SET", "SESSION", "AUTHORIZATION"]:
            # #setSessionAuthorization (SetSessionAuthorizationTask.java):
            # switch the session identity; CURRENT_USER reflects it.
            # Impersonation requires a privilege in the reference
            # (checkCanSetUser) — a restricted role must not sidestep
            # CURRENT_USER-based row filters/masks by switching identity,
            # so deny under any active restricted role (the same owner
            # gate as CREATE/DROP CATALOG).
            from trino_spark.dialect import access as _access

            if _access._state(self)["current"] is not None:
                raise _access.AccessDenied(
                    "Access Denied: SET SESSION AUTHORIZATION requires an owner session"
                )
            user = stripped.split(None, 3)[3].strip().strip("'\"")
            self.session_user = user
            return self.spark.createDataFrame([(user,)], "user: string")
        if up[:3] == ["RESET", "SESSION", "AUTHORIZATION"]:
            self.session_user = "trino"
            return self.spark.createDataFrame([("trino",)], "user: string")
        if up[:2] == ["SET", "SESSION"]:
            # SET SESSION k = v (SystemSessionProperties.java surface):
            # recorded per-engine; spark.* keys pass through to the conf.
            key, _, val = stripped.split(None, 2)[2].partition("=")
            key, val = key.strip(), val.strip().strip("'")
            self.session_properties[key] = val
            if key.startswith("spark."):
                self.spark.conf.set(key, val)
            return self.spark.createDataFrame([(key, val)], "name: string, value: string")
        if up[:2] == ["RESET", "SESSION"]:
            key = stripped.split()[2]
            self.session_properties.pop(key, None)
            if key.startswith("spark."):
                self.spark.conf.unset(key)
            return self.spark.createDataFrame([(key,)], "name: string")
        if up[:2] == ["START", "TRANSACTION"]:
            # Transaction statements (StartTransactionTask.java): DML is
            # copy-on-write, so the transaction pins per-table snapshots
            # (dialect/dml.py txn_*). Access modes are accepted and ignored
            # (single-session engine).
            from trino_spark.dialect import dml as _dml

            _dml.txn_begin(self)
            return self.spark.createDataFrame([("STARTED",)], "transaction: string")
        if up[:1] in (["COMMIT"], ["ROLLBACK"]):
            from trino_spark.dialect import dml as _dml

            if up[0] == "COMMIT":
                _dml.txn_commit(self)
            else:
                _dml.txn_rollback(self)
            return self.spark.createDataFrame([(up[0],)], "transaction: string")
        if up[:3] == ["SHOW", "CREATE", "TABLE"]:
            # SHOW CREATE TABLE (ShowQueriesRewrite.java): rendered DDL.
            name = stripped.split()[3].strip('"').split(".")[-1].lower()
            cols = ",\n   ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in self.spark.table(name).schema.fields
            )
            src = self.catalog._sources.get(name)
            dml_path = getattr(self, "dml_tables", {}).get(name)
            extra = getattr(self, "_table_properties", {}).get(name, {})
            extra_txt = "".join(f",\n   {k} = '{v}'" for k, v in sorted(extra.items()))
            if dml_path:
                with_props = f"\nWITH (\n   format = 'PARQUET',\n   location = '{dml_path}'{extra_txt}\n)"
            elif src is not None:
                with_props = f"\nWITH (\n   format = '{src.format.upper()}',\n   location = '{src.path}'{extra_txt}\n)"
            elif extra:
                kv = ",\n   ".join(f"{k} = '{v}'" for k, v in sorted(extra.items()))
                with_props = f"\nWITH (\n   {kv}\n)"
            else:
                with_props = ""
            ddl = f"CREATE TABLE {name} (\n   {cols}\n){with_props}"
            return self.spark.createDataFrame([(ddl,)], "create_table: string")
        if up[:3] == ["SHOW", "CREATE", "MATERIALIZED"]:
            name = stripped.split()[4].strip('"').split(".")[-1].lower()
            if name not in self.materialized_views:
                raise ValueError(f"materialized view not found: {name}")
            ddl = f"CREATE MATERIALIZED VIEW {name} AS\n{self.materialized_views[name]}"
            return self.spark.createDataFrame([(ddl,)], "create_materialized_view: string")
        if up[:3] == ["SHOW", "STATS", "FOR"]:
            from trino_spark.infoschema import show_stats

            target = stripped.split(None, 3)[3].strip()
            if target.startswith("("):
                # #showStatsForQuery (ShowStatsRewrite.java handles both
                # forms): compute the stats shape over the query result.
                inner = target.strip()[1:-1] if target.endswith(")") else target[1:]
                import os as _os

                view = f"_show_stats_q_{_os.getpid()}"
                self.sql(inner).createOrReplaceTempView(view)
                return show_stats(self.spark, view)
            return show_stats(
                self.spark,
                target.strip('"'),
                cache=getattr(self, "_stats_cache", None),
            )
        if up[:1] == ["ANALYZE"] and len(up) >= 2:
            # ANALYZE <table> (grammar SqlBase.g4; AnalyzeTask.java +
            # connector collectStatistics): run the one-pass stats
            # aggregation now and persist it on the engine — subsequent
            # SHOW STATS serve the collected statistics without a scan.
            from trino_spark.infoschema import show_stats

            cache = getattr(self, "_stats_cache", None)
            if cache is None:
                cache = self._stats_cache = {}
            tbl = stripped.split()[1].strip('"').split(".")[-1].lower()
            cache.pop(tbl, None)
            n = show_stats(self.spark, tbl, cache=cache, populate=True).where(
                "column_name IS NULL"
            ).collect()[0].row_count
            return self.spark.createDataFrame([(tbl, int(n or 0))], "table_name: string, rows: bigint")
        if up[:2] == ["DESCRIBE", "OUTPUT"] and len(up) == 3:
            name = up[2]
            if name not in self.prepared:
                raise ValueError(f"prepared statement not found: {name}")
            from trino_spark.dialect import prepared as _p

            toks = _p.tokenize(self.prepared[name])
            n = sum(1 for t in toks if t.is_sym("?"))
            bound = _p.bind(self.prepared[name], ["NULL"] * n)
            schema = self.spark.sql(translate(bound)).schema
            return self.spark.createDataFrame(
                [(f.name, f.dataType.simpleString()) for f in schema],
                "column_name string, type string",
            )
        if up[:2] == ["DESCRIBE", "INPUT"] and len(up) == 3:
            name = up[2]
            if name not in self.prepared:
                raise ValueError(f"prepared statement not found: {name}")
            from trino_spark.dialect import prepared as _p

            n = sum(1 for t in _p.tokenize(self.prepared[name]) if t.is_sym("?"))
            return self.spark.createDataFrame(
                [(i, "unknown") for i in range(n)], "position int, type string"
            )
        shown = rewrite_show(trino_sql)
        if shown is not None:
            return self.spark.sql(shown)
        import re as _re

        if _re.search(r"\bJSON_TABLE\s*\(", stripped, _re.IGNORECASE):
            # JSON_TABLE clause (grammar SqlBase.g4; operator
            # main/operator/table/json/): execute on the json_table
            # operator, substitute a temp view, re-dispatch.
            from trino_spark.dialect import json_table_sql as _jtsql

            jt_out = _jtsql.try_rewrite(self, stripped)
            if jt_out is not None:
                return jt_out
        if _re.search(r"\bMATCH_RECOGNIZE\b", stripped, _re.IGNORECASE):
            # Row-pattern recognition (grammar SqlBase.g4:448): execute the
            # block on the NFA operator, substitute a temp view, re-dispatch.
            from trino_spark.dialect import match_recognize_sql as _mrsql

            out = _mrsql.try_rewrite(self, stripped)
            if out is not None:
                return out
        if _re.search(r"\bWINDOW\b", stripped, _re.IGNORECASE) and _re.search(
            r"\bPATTERN\s*\(", stripped, _re.IGNORECASE
        ):
            # Row-pattern recognition in WINDOW (docs
            # pattern-recognition-in-window.md): per-row anchored match.
            from trino_spark.dialect import match_recognize_sql as _mrsql

            out = _mrsql.try_rewrite_window(self, stripped)
            if out is not None:
                return out
        expanded = _routines_mod.expand(trino_sql, self.routines)
        spark_sql = translate(expanded)
        if spark_sql.lstrip()[:4].upper() == "WITH":
            # Reused-CTE materialization (Trino CTE materialization / FTE
            # exchange-spool analog): a WITH subplan referenced >= 2 times
            # is computed once and cached instead of inlined N times.
            from trino_spark.dialect import cte as _cte

            spark_sql = _cte.materialize_reused(self, spark_sql)
        df = self.spark.sql(spark_sql)
        # FETCH ... WITH TIES leaves a helper rank column; drop it here.
        if "__rk" in df.columns:
            df = df.drop("__rk")
        return df

    def register_table_function(self, name: str, handler: type, return_type: str) -> None:
        """Register a custom PTF (Python UDTF) callable as TABLE(name(...))
        — the user-facing analog of Trino's ConnectorTableFunction SPI."""
        from trino_spark.dialect import ptf as _ptf

        _ptf.register_table_function(self.spark, name, handler, return_type)

    def _mv_refresh(self, name: str) -> int:
        """(Re)materialize a view: run its definition, store parquet, point
        the name at the STORED data (RefreshMaterializedViewOperator).
        Captures a fingerprint of every referenced source table so
        freshness can be decided later without re-running the view."""
        import datetime
        import os

        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(repo, "spark-warehouse", "mv", name)
        df = self.sql(self.materialized_views[name])
        df.write.mode("overwrite").parquet(path)
        stored = self.spark.read.parquet(path)
        stored.createOrReplaceTempView(name)
        getattr(self, "_stats_cache", {}).pop(name, None)  # new data, stale stats
        self._mv_meta[name] = {
            "sources": self._mv_source_fingerprints(self.materialized_views[name]),
            "last_fresh_time": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        return stored.count()

    def _mv_source_fingerprints(self, defn: str) -> dict[str, str | None]:
        """table -> fingerprint for every relation the defining SQL
        references (FROM/JOIN identifier scan). None = a source whose
        snapshot we cannot observe (jdbc, temp views) -> freshness
        UNKNOWN rather than a false FRESH."""
        import os
        import re

        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        out: dict[str, str | None] = {}
        for m in re.finditer(r"\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*)", defn, re.IGNORECASE):
            name = m.group(1).split(".")[-1].lower()
            src = self.catalog._sources.get(name)
            if src is not None and src.format != "jdbc" and src.path:
                out[name] = self._fs_fingerprint(src.path)
            elif name in self.materialized_views:
                out[name] = self._fs_fingerprint(os.path.join(repo, "spark-warehouse", "mv", name))
            else:
                out[name] = None
        return out

    @staticmethod
    def _fs_fingerprint(path: str) -> str | None:
        """Stable digest of (relative path, size, mtime_ns) for every file
        under `path` — the parquet-dir analog of a lakehouse snapshot id."""
        import hashlib
        import os

        if not path or not os.path.exists(path):
            return None
        entries = []
        if os.path.isfile(path):
            st = os.stat(path)
            entries.append(("", st.st_size, st.st_mtime_ns))
        else:
            for root, _dirs, files in os.walk(path):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    entries.append((os.path.relpath(fp, path), st.st_size, st.st_mtime_ns))
        h = hashlib.md5(repr(sorted(entries)).encode()).hexdigest()
        return h

    def _mv_freshness(self, name: str) -> str:
        meta = self._mv_meta.get(name)
        if meta is None:
            return "UNKNOWN"
        for tbl, fp in meta["sources"].items():
            src = self.catalog._sources.get(tbl)
            if fp is None or src is None:
                return "UNKNOWN"
            if self._fs_fingerprint(src.path) != fp:
                return "STALE"
        return "FRESH"

    def explain(self, trino_sql: str, mode: str = "formatted") -> str:
        """EXPLAIN wrapper (reference: ExplainRewrite.java /
        main/operator/ExplainAnalyzeOperator.java:35)."""
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.sql(trino_sql).explain(mode=mode)
        return buf.getvalue()

    def explain_analyze(self, trino_sql: str) -> str:
        """EXPLAIN ANALYZE: execute, then render the final (AQE-resolved)
        physical plan with PER-OPERATOR runtime statistics — the role of
        Trino's ExplainAnalyzeOperator
        (main/operator/ExplainAnalyzeOperator.java:35). The query runs
        through its own QueryExecution (rows discarded executor-side), so
        each node's SQLMetrics are populated; AQE query stages are
        flattened into one tree."""
        df = self.sql(trino_sql)
        qe = df._jdf.queryExecution()
        qe.toRdd().count()  # execute THIS plan; output stays on executors
        plan = qe.executedPlan()
        try:
            final = plan.executedPlan()  # AdaptiveSparkPlanExec final plan
        except Exception:
            final = plan
        # metric keys worth a line in the report, highest-signal first
        preferred = (
            "numOutputRows", "numFiles", "filesSize", "scanTime", "aggTime",
            "sortTime", "buildTime", "collectTime", "shuffleRecordsWritten",
            "dataSize", "numPartitions", "peakMemory", "spillSize",
        )
        lines: list[str] = []

        def walk(node, depth: int) -> None:
            name = node.nodeName()
            if "QueryStage" in name:
                walk(node.plan(), depth)
                return
            if name.startswith("WholeStageCodegen") or name == "InputAdapter":
                for i in range(node.children().size()):
                    walk(node.children().apply(i), depth)
                return
            mets: dict[str, int] = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = kv._2().value()
            shown = [k for k in preferred if k in mets]
            shown += [k for k in sorted(mets) if k not in preferred and mets[k]][:3]
            stats = ", ".join(f"{k}={mets[k]}" for k in shown[:6])
            lines.append("  " * depth + name + (f" [{stats}]" if stats else ""))
            for i in range(node.children().size()):
                walk(node.children().apply(i), depth + 1)

        try:
            walk(final, 0)
            return "\n".join(lines)
        except Exception:
            # py4j tree-walk is best-effort; the executed plan string still
            # reflects the AQE-final shape
            return plan.toString()
