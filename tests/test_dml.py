"""Dialect DML tests: CTAS / INSERT / DELETE / UPDATE / MERGE / TRUNCATE /
DROP through TrinoEngine.sql, copy-on-write managed tables.

Reference semantics: SURVEY §3.3 entry point C — TableWriterOperator +
TableFinishOperator rowcount result (TableWriterOperator.java:69),
MergeWriterOperator row routing (MergeWriterOperator.java:48), and the
"connector does not support updates" guard for read-only sources."""

import pytest

from trino_spark.dialect import TrinoEngine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = TrinoEngine(spark, sf_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS dml_t")
    return eng


def _rows(df):
    return df.collect()[0][0]


def test_ctas_and_select(engine):
    n = _rows(engine.sql("CREATE TABLE dml_t AS SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r FROM nation"))
    assert n == 25
    assert engine.sql("SELECT count(*) AS c FROM dml_t").collect()[0].c == 25


def test_ctas_if_not_exists_noop(engine):
    n = _rows(engine.sql("CREATE TABLE IF NOT EXISTS dml_t AS SELECT 1 AS x"))
    assert n == 0
    assert engine.sql("SELECT count(*) AS c FROM dml_t").collect()[0].c == 25


def test_insert_select(engine):
    n = _rows(engine.sql("INSERT INTO dml_t SELECT n_nationkey + 100, upper(n_name), n_regionkey FROM nation WHERE n_regionkey = 0"))
    assert n == 5
    assert engine.sql("SELECT count(*) AS c FROM dml_t").collect()[0].c == 30


def test_insert_column_list_null_fill(engine):
    n = _rows(engine.sql("INSERT INTO dml_t (k, r) SELECT 999, 9"))
    assert n == 1
    row = engine.sql("SELECT * FROM dml_t WHERE k = 999").collect()[0]
    assert row.name is None and row.r == 9


def test_update_where(engine):
    n = _rows(engine.sql("UPDATE dml_t SET name = lower(name) WHERE r = 1"))
    assert n == 5
    names = [r.name for r in engine.sql("SELECT name FROM dml_t WHERE r = 1").collect()]
    assert names and all(nm == nm.lower() for nm in names)


def test_delete_where(engine):
    n = _rows(engine.sql("DELETE FROM dml_t WHERE k >= 900"))
    assert n == 1
    assert engine.sql("SELECT count(*) AS c FROM dml_t").collect()[0].c == 30


def test_merge_full(engine):
    n = _rows(
        engine.sql(
            """
        MERGE INTO dml_t t USING (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r
                                  FROM nation WHERE n_regionkey IN (2, 4)) s
        ON t.k = s.k
        WHEN MATCHED AND s.r = 4 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = concat(t.name, '!')
        WHEN NOT MATCHED THEN INSERT (k, name, r) VALUES (s.k + 200, s.name, s.r)
        """
        )
    )
    # nation has 5 keys per region; all 10 source rows match -> affected 10.
    assert n == 10
    out = {r.k: r.name for r in engine.sql("SELECT k, name FROM dml_t").collect()}
    # region-4 keys deleted, region-2 keys updated with '!'
    assert sum(1 for nm in out.values() if nm and nm.endswith("!")) == 5


def test_merge_insert_not_matched(engine):
    n = _rows(
        engine.sql(
            """
        MERGE INTO dml_t t USING (SELECT 5000 AS k, 'NEW' AS name, 0 AS r) s
        ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, name, r) VALUES (s.k, s.name, s.r)
        """
        )
    )
    assert n == 1
    assert engine.sql("SELECT name FROM dml_t WHERE k = 5000").collect()[0].name == "NEW"


def test_merge_update_before_delete_rejected(engine):
    with pytest.raises(ValueError, match="DELETE before UPDATE"):
        engine.sql(
            """
            MERGE INTO dml_t t USING (SELECT 1 AS k) s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET name = 'x'
            WHEN MATCHED AND s.k = 1 THEN DELETE
            """
        )


def test_merge_non_equi_on_rejected(engine):
    with pytest.raises(ValueError, match="equalities"):
        engine.sql(
            """
            MERGE INTO dml_t t USING (SELECT 1 AS k) s ON t.k > s.k
            WHEN MATCHED THEN DELETE
            """
        )


def test_mutating_readonly_source_raises(engine):
    with pytest.raises(ValueError, match="does not support updates"):
        engine.sql("DELETE FROM nation WHERE n_nationkey = 0")
    with pytest.raises(ValueError, match="does not support updates"):
        engine.sql("UPDATE nation SET n_name = 'x'")


def test_truncate_and_drop(engine):
    engine.sql("CREATE TABLE dml_tmp AS SELECT 1 AS x")
    engine.sql("TRUNCATE TABLE dml_tmp")
    assert engine.sql("SELECT count(*) AS c FROM dml_tmp").collect()[0].c == 0
    engine.sql("DROP TABLE dml_tmp")
    with pytest.raises(Exception):
        engine.sql("SELECT * FROM dml_tmp").collect()
    # idempotent with IF EXISTS
    engine.sql("DROP TABLE IF EXISTS dml_tmp")


def test_delete_null_predicate_keeps_row(engine):
    engine.sql("CREATE TABLE dml_null AS SELECT * FROM (VALUES (1, 10), (2, NULL)) AS v(id, val)")
    n = _rows(engine.sql("DELETE FROM dml_null WHERE val < 100"))
    assert n == 1  # NULL predicate row is kept (three-valued logic)
    assert engine.sql("SELECT id FROM dml_null").collect()[0].id == 2
    engine.sql("DROP TABLE dml_null")


class TestTransactions:
    """START TRANSACTION / COMMIT / ROLLBACK over copy-on-write managed
    tables (snapshot pin + restore; reference StartTransactionTask.java)."""

    def test_rollback_restores_pre_txn_state(self, engine):
        engine.sql("DROP TABLE IF EXISTS txn_t")
        engine.sql("CREATE TABLE txn_t AS SELECT n_nationkey AS k FROM nation")
        engine.sql("START TRANSACTION")
        engine.sql("DELETE FROM txn_t WHERE k < 20")
        assert engine.sql("SELECT count(*) AS c FROM txn_t").collect()[0].c == 5
        engine.sql("ROLLBACK")
        assert engine.sql("SELECT count(*) AS c FROM txn_t").collect()[0].c == 25
        engine.sql("DROP TABLE txn_t")

    def test_commit_keeps_changes(self, engine):
        engine.sql("DROP TABLE IF EXISTS txn_c")
        engine.sql("CREATE TABLE txn_c AS SELECT n_nationkey AS k FROM nation")
        engine.sql("START TRANSACTION")
        engine.sql("UPDATE txn_c SET k = k + 1000 WHERE k = 0")
        engine.sql("COMMIT")
        assert engine.sql("SELECT max(k) AS m FROM txn_c").collect()[0].m == 1000
        engine.sql("DROP TABLE txn_c")

    def test_rollback_drops_tables_created_in_txn(self, engine):
        engine.sql("START TRANSACTION")
        engine.sql("CREATE TABLE txn_new AS SELECT 1 AS x")
        engine.sql("ROLLBACK")
        import pytest as _pytest

        with _pytest.raises(Exception):
            engine.sql("SELECT * FROM txn_new").collect()

    def test_rollback_restores_dropped_table(self, engine):
        engine.sql("DROP TABLE IF EXISTS txn_d")
        engine.sql("CREATE TABLE txn_d AS SELECT 7 AS x")
        engine.sql("START TRANSACTION")
        engine.sql("DROP TABLE txn_d")
        engine.sql("ROLLBACK")
        assert engine.sql("SELECT x FROM txn_d").collect()[0].x == 7
        engine.sql("DROP TABLE txn_d")

    def test_nested_txn_rejected(self, engine):
        engine.sql("START TRANSACTION")
        with pytest.raises(ValueError, match="already in progress"):
            engine.sql("START TRANSACTION")
        engine.sql("ROLLBACK")

    def test_commit_without_txn_rejected(self, engine):
        with pytest.raises(ValueError, match="no transaction"):
            engine.sql("COMMIT")


def test_show_create_table(engine):
    ddl = engine.sql("SHOW CREATE TABLE nation").collect()[0].create_table
    assert "CREATE TABLE nation" in ddl and "n_nationkey" in ddl and "PARQUET" in ddl


def test_show_create_materialized_view(engine):
    engine.sql("CREATE MATERIALIZED VIEW scmv AS SELECT count(*) AS c FROM nation")
    ddl = engine.sql("SHOW CREATE MATERIALIZED VIEW scmv").collect()[0].create_materialized_view
    assert ddl.startswith("CREATE MATERIALIZED VIEW scmv AS")
    engine.sql("DROP MATERIALIZED VIEW scmv")


def test_describe_and_explain_types(engine):
    cols = [r.column_name for r in engine.sql("DESCRIBE nation").collect()]
    assert cols == ["n_nationkey", "n_name", "n_regionkey"]
    assert "VALID" in engine.sql("EXPLAIN (TYPE VALIDATE) SELECT 1").collect()[0].query_plan
    logical = engine.sql("EXPLAIN (TYPE LOGICAL) SELECT count(*) FROM nation").collect()[0].query_plan
    assert "Optimized Logical Plan" in logical or "Aggregate" in logical
    io = engine.sql("EXPLAIN (TYPE IO) SELECT n_name FROM nation").collect()[0].query_plan
    assert "parquet" in io.lower() or "relation" in io.lower()
    dist = engine.sql("EXPLAIN (TYPE DISTRIBUTED) SELECT count(*) FROM nation").collect()[0].query_plan
    assert "Physical Plan" in dist or "Exchange" in dist or "HashAggregate" in dist


class TestDDL:
    """CREATE VIEW / plain CREATE TABLE / ALTER TABLE (CreateViewTask /
    CreateTableTask / AddColumnTask-family statement surface)."""

    def test_create_view_lazy(self, engine):
        engine.sql("CREATE TABLE ddl_base AS SELECT 1 AS x")
        engine.sql("CREATE VIEW ddl_v AS SELECT x * 10 AS y FROM ddl_base")
        assert engine.sql("SELECT y FROM ddl_v").collect()[0].y == 10
        ddl = engine.sql("SHOW CREATE VIEW ddl_v").collect()[0].create_view
        assert ddl.startswith("CREATE VIEW ddl_v AS")
        engine.sql("DROP VIEW ddl_v")
        engine.sql("DROP TABLE ddl_base")

    def test_create_view_duplicate_rejected_or_replace(self, engine):
        engine.sql("CREATE VIEW ddl_v2 AS SELECT 1 AS a")
        with pytest.raises(ValueError, match="already exists"):
            engine.sql("CREATE VIEW ddl_v2 AS SELECT 2 AS a")
        engine.sql("CREATE OR REPLACE VIEW ddl_v2 AS SELECT 2 AS a")
        assert engine.sql("SELECT a FROM ddl_v2").collect()[0].a == 2
        engine.sql("DROP VIEW ddl_v2")

    def test_create_empty_table_then_insert(self, engine):
        engine.sql("DROP TABLE IF EXISTS ddl_e")
        engine.sql("CREATE TABLE ddl_e (id BIGINT, name VARCHAR(20), price DOUBLE)")
        assert engine.sql("SELECT count(*) AS c FROM ddl_e").collect()[0].c == 0
        n = engine.sql("INSERT INTO ddl_e SELECT 1, 'a', 9.5").collect()[0][0]
        assert n == 1
        row = engine.sql("SELECT * FROM ddl_e").collect()[0]
        assert row.id == 1 and row.name == "a" and row.price == 9.5
        engine.sql("DROP TABLE ddl_e")

    def test_alter_add_drop_rename_column(self, engine):
        engine.sql("DROP TABLE IF EXISTS ddl_a")
        engine.sql("CREATE TABLE ddl_a AS SELECT 1 AS x, 'k' AS tag")
        engine.sql("ALTER TABLE ddl_a ADD COLUMN note VARCHAR")
        row = engine.sql("SELECT * FROM ddl_a").collect()[0]
        assert row.note is None
        engine.sql("ALTER TABLE ddl_a RENAME COLUMN note TO comment")
        assert "comment" in engine.sql("SELECT * FROM ddl_a").columns
        engine.sql("ALTER TABLE ddl_a DROP COLUMN comment")
        assert engine.sql("SELECT * FROM ddl_a").columns == ["x", "tag"]
        engine.sql("ALTER TABLE ddl_a RENAME TO ddl_b")
        assert engine.sql("SELECT x FROM ddl_b").collect()[0].x == 1
        engine.sql("DROP TABLE ddl_b")

    def test_alter_guards(self, engine):
        engine.sql("DROP TABLE IF EXISTS ddl_g")
        engine.sql("CREATE TABLE ddl_g AS SELECT 1 AS only_col")
        with pytest.raises(ValueError, match="only column"):
            engine.sql("ALTER TABLE ddl_g DROP COLUMN only_col")
        with pytest.raises(ValueError, match="not found"):
            engine.sql("ALTER TABLE ddl_g DROP COLUMN ghost")
        with pytest.raises(ValueError, match="does not support updates"):
            engine.sql("ALTER TABLE nation ADD COLUMN c INT")
        engine.sql("DROP TABLE ddl_g")


def test_system_runtime_nodes_and_infoschema_views(engine):
    nodes = engine.sql("SELECT * FROM system.runtime.nodes").collect()
    assert len(nodes) == 1 and nodes[0].coordinator is True and nodes[0].state == "active"
    engine.sql("CREATE OR REPLACE VIEW isv_demo AS SELECT 1 AS a")
    views = {r.table_name: r.view_type for r in engine.sql("SELECT * FROM information_schema.views").collect()}
    assert views.get("isv_demo") == "VIEW"
    engine.sql("DROP VIEW isv_demo")


def test_show_tables_reflects_ddl(engine):
    engine.sql("CREATE TABLE st_demo AS SELECT 1 AS x")
    names = {r.table_name for r in engine.sql("SHOW TABLES").collect()}
    assert "st_demo" in names and "nation" in names
    cols = [r.column_name for r in engine.sql("SHOW COLUMNS FROM st_demo").collect()]
    assert cols == ["x"]
    engine.sql("DROP TABLE st_demo")
    names = {r.table_name for r in engine.sql("SHOW TABLES").collect()}
    assert "st_demo" not in names


def test_ctas_with_partitioned_by(engine):
    import os

    engine.sql("DROP TABLE IF EXISTS part_t")
    n = engine.sql(
        "CREATE TABLE part_t WITH (format = 'PARQUET', partitioned_by = ARRAY['r']) AS "
        "SELECT n_nationkey AS k, n_regionkey AS r FROM nation"
    ).collect()[0][0]
    assert n == 25
    path = engine.dml_tables["part_t"]
    assert any(d.startswith("r=") for d in os.listdir(path))
    # mutations preserve the partitioned layout
    engine.sql("DELETE FROM part_t WHERE r = 4")
    assert not any(d == "r=4" for d in os.listdir(engine.dml_tables["part_t"]))
    assert any(d.startswith("r=") for d in os.listdir(engine.dml_tables["part_t"]))
    assert engine.sql("SELECT count(*) AS c FROM part_t").collect()[0].c == 20
    engine.sql("DROP TABLE part_t")


def test_ctas_with_bad_format_rejected(engine):
    with pytest.raises(ValueError, match="parquet only"):
        engine.sql("CREATE TABLE bad_fmt WITH (format = 'ORC') AS SELECT 1 AS x")


def test_ctas_with_unknown_property_rejected(engine):
    with pytest.raises(ValueError, match="unsupported CTAS table property"):
        engine.sql("CREATE TABLE bad_prop WITH (bucket_count = 8) AS SELECT 1 AS x")


def test_set_time_zone_and_use(engine):
    engine.sql("SET TIME ZONE 'America/New_York'")
    try:
        # UTC midnight renders as 19:00 previous day in New York
        out = engine.sql(
            "SELECT date_format(TIMESTAMP '2024-06-01 00:00:00+00:00', '%H:%i') AS hm"
        ).collect()[0].hm
        assert out == "20:00"  # EDT = UTC-4 in June
    finally:
        engine.sql("SET TIME ZONE LOCAL")
    assert engine.spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert engine.sql("USE memory.default").collect()[0].schema == "memory.default"
