"""DBAPI client + CLI tests against a live TrinoHttpServer
(client/trino-client StatementClientV1 + client/trino-cli Console parity)."""

import datetime
import decimal
import io

import pytest

from trino_spark import cli
from trino_spark import client as dbapi
from trino_spark.dialect.engine import TrinoEngine
from trino_spark.server import PAGE_ROWS, TrinoHttpServer


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    eng = TrinoEngine(spark, sf_dir)
    srv = TrinoHttpServer(eng).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def conn(server):
    with dbapi.connect(server.url()) as c:
        yield c


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "qmark"
    assert issubclass(dbapi.DatabaseError, dbapi.Error)


def test_cursor_roundtrip(conn):
    cur = conn.execute("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    assert [d[0] for d in cur.description] == ["r_regionkey", "r_name"]
    assert cur.description[1][1] == "varchar"
    rows = cur.fetchall()
    assert len(rows) == 5 and rows[0][0] == 0
    assert cur.rowcount == 5


def test_fetch_granularities(conn):
    cur = conn.execute("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert cur.fetchone() == [0]
    assert [r[0] for r in cur.fetchmany(3)] == [1, 2, 3]
    rest = cur.fetchall()
    assert rest[0][0] == 4 and len(rest) == 21


def test_iteration_and_lazy_paging(conn):
    n = PAGE_ROWS + 13
    cur = conn.execute(f"SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT {n}")
    keys = [r[0] for r in cur]
    assert len(keys) == n and keys == sorted(keys)


def test_qmark_params(conn):
    cur = conn.execute(
        "SELECT n_name FROM nation WHERE n_nationkey = ? AND n_name <> ? ORDER BY n_name",
        [3, "it''s"],
    )
    rows = cur.fetchall()
    assert len(rows) == 1


def test_param_escaping_types():
    assert dbapi._escape_param(None) == "NULL"
    assert dbapi._escape_param(True) == "TRUE"
    assert dbapi._escape_param("o'brien") == "'o''brien'"
    assert dbapi._escape_param(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert dbapi._escape_param(b"\x01\xff") == "X'01ff'"
    assert dbapi._escape_param([1, 2]) == "ARRAY[1, 2]"
    assert dbapi._escape_param(decimal.Decimal("1.50")) == "DECIMAL '1.50'"


def test_bind_skips_literals_and_comments():
    sql = "SELECT '?' , x -- ? in comment\n FROM t WHERE y = ?"
    bound = dbapi._bind(sql, [7])
    assert bound.endswith("y = 7") and "'?'" in bound and "-- ? in comment" in bound
    with pytest.raises(dbapi.ProgrammingError):
        dbapi._bind("SELECT ?", [])
    with pytest.raises(dbapi.ProgrammingError):
        dbapi._bind("SELECT 1", [1])


def test_typed_materialization(conn):
    cur = conn.execute(
        "SELECT o_orderdate, CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders LIMIT 1"
    )
    row = cur.fetchone()
    assert isinstance(row[0], datetime.date)
    assert isinstance(row[1], datetime.datetime)


def test_error_raises_database_error(conn):
    with pytest.raises(dbapi.DatabaseError):
        conn.execute("SELECT * FROM no_such_table_abc")


def test_cancel_midstream(conn):
    cur = conn.execute(f"SELECT o_orderkey FROM orders LIMIT {PAGE_ROWS + 500}")
    assert cur.fetchone() is not None
    cur.cancel()
    # buffered page drains; the server-side remainder is discarded
    assert len(cur.fetchmany(PAGE_ROWS * 2)) <= PAGE_ROWS


def test_spooled_connection_matches_inline(server, conn):
    inline = conn.execute("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey").fetchall()
    with dbapi.connect(server.url(), spooled=True, encoding="json+zlib") as sc:
        spooled = sc.execute(
            "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"
        ).fetchall()
    assert inline == spooled


def test_closed_cursor_rejects(conn):
    cur = conn.cursor()
    cur.close()
    with pytest.raises(dbapi.InterfaceError):
        cur.execute("SELECT 1")


# ---------------------------------------------------------------- CLI


def test_cli_split_statements():
    stmts, rest = cli.split_statements("SELECT 1; SELECT ';'; SELECT -- ;\n 2; SELECT 3")
    assert stmts == ["SELECT 1", "SELECT ';'", "SELECT -- ;\n 2"]
    assert rest.strip() == "SELECT 3"


def test_cli_aligned_render():
    out = io.StringIO()
    cli.render("ALIGNED", ["k", "name"], [[1, "aa"], [22, "b"]], out)
    text = out.getvalue()
    lines = text.splitlines()
    assert "k" in lines[0] and "name" in lines[0]
    assert set(lines[1]) <= {"-", "+"}
    assert "(2 rows)" in text
    # numeric column right-aligned: '22' flush right under width-2 column
    assert lines[3].startswith(" 22 |")


def test_cli_execute_against_server(server):
    out = io.StringIO()
    rc = cli.main(
        ["--server", server.url(), "-e",
         "SELECT count(*) AS n FROM region; SELECT 1 AS one", "--output-format", "CSV_HEADER"],
        stdout=out,
    )
    assert rc == 0
    assert "n\r\n5" in out.getvalue().replace("\n\n", "\n") or "n\r\n5" in out.getvalue()
    assert "one" in out.getvalue()


def test_cli_repl_reads_stdin(server):
    out = io.StringIO()
    stdin = io.StringIO("SELECT r_name FROM region WHERE r_regionkey = 0;\nquit\n")
    rc = cli.main(["--server", server.url()], stdin=stdin, stdout=out)
    assert rc == 0 and "AFRICA" in out.getvalue()


def test_cli_error_exit_code(server):
    out = io.StringIO()
    rc = cli.main(["--server", server.url(), "-e", "SELECT * FROM missing_tbl"], stdout=out)
    assert rc == 1 and "Query failed" in out.getvalue()
