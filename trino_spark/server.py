"""HTTP SQL entry point — the wire-level analog of Trino's client protocol.

Reference (SURVEY.md §3.1): client POST /v1/statement
(main/dispatcher/QueuedStatementResource.java:110) → dispatch → execute →
client polls nextUri (main/server/protocol/ExecutingStatementResource.java:67);
each response carries {id, columns, data, stats, nextUri?} pages.

This module serves that protocol shape over TrinoEngine: POST /v1/statement
runs `engine.sql(text)` and the client pulls fixed-size pages via nextUri
until exhausted — same three-state lifecycle (QUEUED page with nextUri →
executing pages with data → final page without nextUri) the reference
emits, minus auth/resource groups. Columns carry Trino-style type names
(bigint/varchar/double/...) mapped from the Spark schema.

Threaded stdlib server (no deps). Executing a statement collects the
result into the server's page store; this endpoint is a CONTROL-plane
surface for interactive clients — bulk data still belongs in
DataFrame/parquet land, exactly like the reference's protocol, which also
streams result pages through the coordinator.
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import types as T

PAGE_ROWS = 1000

_SPARK_TO_TRINO = {
    "long": "bigint",
    "int": "integer",
    "short": "smallint",
    "byte": "tinyint",
    "string": "varchar",
    "double": "double",
    "float": "real",
    "boolean": "boolean",
    "date": "date",
    "binary": "varbinary",
}


def _trino_type(dt: T.DataType) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return s
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("array<") or s.startswith("map<") or s.startswith("struct<"):
        return s.replace("struct<", "row(").replace(">", ")") if s.startswith("struct<") else s
    return _SPARK_TO_TRINO.get(s, s)


def _json_cell(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_cell(x) for k, x in v.items()}
    if hasattr(v, "asDict"):
        return {k: _json_cell(x) for k, x in v.asDict().items()}
    return str(v)


class _QueryState:
    def __init__(self, qid: str, columns: list[dict], rows: list[list]):
        self.qid = qid
        self.columns = columns
        self.rows = rows
        self.offset = 0
        self.error: dict | None = None


class TrinoHttpServer:
    """Minimal /v1/statement server over a TrinoEngine."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._queries: dict[str, _QueryState] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/v1/statement":
                    self._send(404, {"error": "not found"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                sql = self.rfile.read(n).decode()
                self._send(200, outer._submit(sql))

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                # /v1/statement/executing/<qid>/<token>
                if len(parts) >= 4 and parts[:3] == ["v1", "statement", "executing"]:
                    page = outer._page(parts[3])
                    if page is None:
                        self._send(404, {"error": "unknown query"})
                    else:
                        self._send(200, page)
                    return
                self._send(404, {"error": "not found"})

            def do_DELETE(self):
                # Cancellation: clients DELETE the nextUri to abandon a
                # query (Query.java cancel path); remaining pages are
                # discarded and further polls 404.
                parts = self.path.strip("/").split("/")
                if len(parts) >= 4 and parts[:3] == ["v1", "statement", "executing"]:
                    with outer._lock:
                        existed = outer._queries.pop(parts[3], None) is not None
                    self._send(204 if existed else 404, {})
                    return
                self._send(404, {"error": "not found"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "TrinoHttpServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    # -- protocol ----------------------------------------------------------
    def _submit(self, sql: str) -> dict:
        qid = uuid.uuid4().hex[:16]
        # Run under a Spark job group named by the query id so
        # system.runtime.kill_query(qid) can cancel the running jobs from
        # another request thread (KillQueryProcedure.java semantics).
        sc = self.engine.spark.sparkContext
        running = getattr(self.engine, "_running_queries", None)
        if running is None:
            running = self.engine._running_queries = {}
        running[qid] = sql.strip()[:200]
        sc.setJobGroup(qid, sql.strip()[:80], interruptOnCancel=True)
        try:
            df = self.engine.sql(sql)
            columns = [
                {"name": f.name, "type": _trino_type(f.dataType)} for f in df.schema
            ]
            rows = [[_json_cell(v) for v in row] for row in df.collect()]
            st = _QueryState(qid, columns, rows)
        except Exception as exc:  # surface as a Trino-style error payload
            st = _QueryState(qid, [], [])
            st.error = {"message": str(exc).split("\n")[0][:500], "errorName": type(exc).__name__}
        finally:
            running.pop(qid, None)
            sc.setLocalProperty("spark.jobGroup.id", None)
        with self._lock:
            self._queries[qid] = st
        # QUEUED-style first response: no data yet, client follows nextUri
        # (QueuedStatementResource.java:172 shape)
        resp = {"id": qid, "stats": {"state": "QUEUED"}}
        if st.error is not None:
            resp["stats"] = {"state": "FAILED"}
            resp["error"] = st.error
        else:
            resp["nextUri"] = f"{self.url()}/v1/statement/executing/{qid}/0"
        return resp

    def _page(self, qid: str) -> dict | None:
        with self._lock:
            st = self._queries.get(qid)
        if st is None:
            return None
        if st.error is not None:
            return {"id": qid, "stats": {"state": "FAILED"}, "error": st.error}
        page = st.rows[st.offset : st.offset + PAGE_ROWS]
        st.offset += len(page)
        resp = {
            "id": qid,
            "columns": st.columns,
            "data": page,
            "stats": {"state": "FINISHED" if st.offset >= len(st.rows) else "RUNNING"},
        }
        if st.offset < len(st.rows):
            resp["nextUri"] = f"{self.url()}/v1/statement/executing/{qid}/{st.offset}"
        else:
            with self._lock:
                self._queries.pop(qid, None)
        return resp


def fetch_all(base_url: str, sql: str) -> tuple[list[dict], list[list]]:
    """Tiny reference client: POST then follow nextUri pages (the loop every
    Trino client implements)."""
    import urllib.request

    req = urllib.request.Request(
        f"{base_url}/v1/statement", data=sql.encode(), method="POST"
    )
    resp = json.loads(urllib.request.urlopen(req).read())
    columns: list[dict] = []
    rows: list[list] = []
    while True:
        if "error" in resp:
            raise RuntimeError(resp["error"]["message"])
        columns = resp.get("columns") or columns
        rows.extend(resp.get("data") or [])
        nxt = resp.get("nextUri")
        if not nxt:
            return columns, rows
        resp = json.loads(urllib.request.urlopen(nxt).read())
