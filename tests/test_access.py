"""Access control + comments (dialect/access.py): roles, grants,
enforcement, COMMENT ON, system.metadata.table_comments."""

import pytest

from trino_spark.dialect import TrinoEngine
from trino_spark.dialect.access import AccessDenied


@pytest.fixture()
def engine(spark, sf_dir):
    return TrinoEngine(spark, sf_dir=sf_dir)


def test_role_lifecycle_and_show(engine):
    engine.sql("CREATE ROLE analyst")
    assert [r.role for r in engine.sql("SHOW ROLES").collect()] == ["analyst"]
    engine.sql("DROP ROLE analyst")
    assert engine.sql("SHOW ROLES").collect() == []


def test_grant_enforcement(engine):
    engine.sql("CREATE ROLE reader")
    engine.sql("GRANT SELECT ON nation TO ROLE reader")
    engine.sql("SET ROLE reader")
    assert engine.sql("SELECT count(*) AS c FROM nation").collect()[0].c == 25
    with pytest.raises(AccessDenied, match="lacks SELECT on region"):
        engine.sql("SELECT count(*) AS c FROM region").collect()
    with pytest.raises(AccessDenied, match="lacks SELECT"):
        engine.sql("SELECT count(*) AS c FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey").collect()
    engine.sql("SET ROLE NONE")
    assert engine.sql("SELECT count(*) AS c FROM region").collect()[0].c == 5


def test_dml_privileges(engine):
    engine.sql("DROP TABLE IF EXISTS acl_t")
    engine.sql("CREATE TABLE acl_t AS SELECT 1 AS x")
    engine.sql("CREATE ROLE writer")
    engine.sql("GRANT SELECT, INSERT ON acl_t TO ROLE writer")
    engine.sql("SET ROLE writer")
    engine.sql("INSERT INTO acl_t SELECT 2")
    with pytest.raises(AccessDenied, match="lacks DELETE"):
        engine.sql("DELETE FROM acl_t WHERE x = 1")
    engine.sql("SET ROLE NONE")
    engine.sql("GRANT ALL ON acl_t TO ROLE writer")
    engine.sql("SET ROLE writer")
    engine.sql("DELETE FROM acl_t WHERE x = 1")
    engine.sql("SET ROLE NONE")
    engine.sql("DROP TABLE acl_t")


def test_revoke(engine):
    engine.sql("CREATE ROLE temp_r")
    engine.sql("GRANT SELECT ON nation TO ROLE temp_r")
    engine.sql("REVOKE SELECT ON nation FROM ROLE temp_r")
    engine.sql("SET ROLE temp_r")
    with pytest.raises(AccessDenied):
        engine.sql("SELECT 1 AS x FROM nation").collect()
    engine.sql("SET ROLE NONE")


def test_show_grants(engine):
    engine.sql("CREATE ROLE g1")
    engine.sql("GRANT SELECT, DELETE ON orders TO ROLE g1")
    rows = [(r.grantee, r.privilege) for r in engine.sql("SHOW GRANTS ON orders").collect()]
    assert ("g1", "SELECT") in rows and ("g1", "DELETE") in rows


def test_infoschema_readable_under_role(engine):
    engine.sql("CREATE ROLE limited")
    engine.sql("SET ROLE limited")
    assert len(engine.sql("SHOW TABLES").collect()) > 0
    engine.sql("SET ROLE NONE")


def test_comments(engine):
    engine.sql("COMMENT ON TABLE nation IS 'the 25 nations'")
    engine.sql("COMMENT ON COLUMN nation.n_name IS 'uppercase name'")
    rows = engine.sql(
        "SELECT table_name, comment FROM system.metadata.table_comments"
    ).collect()
    assert ("nation", "the 25 nations") in [(r.table_name, r.comment) for r in rows]
    engine.sql("COMMENT ON TABLE nation IS NULL")
    rows = engine.sql("SELECT table_name FROM system.metadata.table_comments").collect()
    assert "nation" not in [r.table_name for r in rows]


class TestCallProcedures:
    """CALL statement + procedure registry (grammar SqlBase.g4 CALL;
    connector procedures SPI)."""

    def test_register_tpch(self, engine):
        engine.sql("CALL system.register_tpch(0.001)")
        n = engine.sql("SELECT count(*) AS c FROM tpchgen_orders").collect()[0].c
        assert n == 1500

    def test_register_faker(self, engine):
        engine.sql("CALL system.register_faker('fk_users', 'uid bigint, email string', 20, 7)")
        rows = engine.sql("SELECT * FROM fk_users").collect()
        assert len(rows) == 20 and all("@" in r.email for r in rows)

    def test_flush_query_log(self, engine):
        engine.sql("SELECT 1 AS x").collect()
        flushed = engine.sql("CALL system.flush_query_log()").collect()[0].flushed
        assert flushed >= 1
        again = engine.sql("CALL system.flush_query_log()").collect()[0].flushed
        assert again <= 1

    def test_unknown_procedure(self, engine):
        with pytest.raises(ValueError, match="procedure not found"):
            engine.sql("CALL system.no_such_proc()")
