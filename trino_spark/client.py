"""DBAPI 2.0 client for the engine's HTTP protocol — the Python analog of
the reference's client libraries.

Reference parity: client/trino-client/src/main/java/io/trino/client/
StatementClientV1.java (submit → follow nextUri → pages; DELETE nextUri to
cancel) and its spooled-segment flow
(client/trino-client/src/main/java/io/trino/client/spooling/). The wire
shape is served by `trino_spark.server.TrinoHttpServer`; this module is the
other half: a PEP 249 `connect()` / `Connection` / `Cursor` surface so any
DBAPI-consuming tool (ORMs, notebook magics, `pandas.read_sql`) can run
Trino SQL against the engine.

Design notes:
- stdlib-only (urllib); pages are fetched LAZILY — `fetchone()` pulls the
  next page only when the local buffer drains, so a client can abandon a
  big result early and `cancel()` (DELETE) the remainder, exactly like the
  reference client's streaming iterator.
- qmark (`?`) parameter binding is client-side literal substitution with
  full escaping — the engine also supports server-side PREPARE/EXECUTE
  (dialect/prepared.py); this client keeps the wire simple.
- Values arrive as protocol JSON; `Cursor` converts typed columns back to
  Python objects (date/timestamp → datetime, decimal → Decimal,
  varbinary → bytes) the way the reference client materializes typed rows.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import json
import urllib.error
import urllib.parse
import urllib.request

apilevel = "2.0"
threadsafety = 2  # threads may share the module and connections
paramstyle = "qmark"


# --------------------------------------------------------------- exceptions
class Warning(Exception):  # noqa: A001 - DBAPI mandated name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class OperationalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# ------------------------------------------------------------- type mapping
def _parse_timestamp(s: str) -> _dt.datetime:
    s = s.replace("T", " ")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp: {s!r}")


def _converter(trino_type: str):
    """Python-side materializer for one column type (None = identity)."""
    t = trino_type.lower()
    if t == "date":
        return lambda v: _dt.date.fromisoformat(v) if isinstance(v, str) else v
    if t.startswith("timestamp"):
        return lambda v: _parse_timestamp(v) if isinstance(v, str) else v
    if t.startswith("decimal"):
        return lambda v: _dec.Decimal(str(v)) if v is not None else None
    if t == "varbinary":
        import base64

        return lambda v: base64.b64decode(v) if isinstance(v, str) else v
    return None


def _escape_param(v) -> str:
    """Render one Python value as a Trino SQL literal (qmark binding)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        raise ProgrammingError("cannot bind non-finite float parameter")
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dec.Decimal):
        return f"DECIMAL '{v}'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + v.hex() + "'"
    if isinstance(v, (list, tuple)):
        return "ARRAY[" + ", ".join(_escape_param(x) for x in v) + "]"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise ProgrammingError(f"cannot bind parameter of type {type(v).__name__}")


def _bind(sql: str, params) -> str:
    """Substitute `?` placeholders outside string literals, quoted
    identifiers, and line/block comments."""
    if params is None:
        return sql
    params = list(params)
    out: list[str] = []
    it = iter(params)
    i, n = 0, len(sql)
    n_bound = 0
    while i < n:
        c = sql[i]
        if c in ("'", '"'):  # skip string literal / quoted ident ('' escapes)
            q = c
            j = i + 1
            while j < n:
                if sql[j] == q and j + 1 < n and sql[j + 1] == q:
                    j += 2
                elif sql[j] == q:
                    break
                else:
                    j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = j
        elif c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            out.append(sql[i:j])
            i = j
        elif c == "?":
            try:
                out.append(_escape_param(next(it)))
            except StopIteration:
                raise ProgrammingError("not enough parameters for placeholders") from None
            n_bound += 1
            i += 1
        else:
            out.append(c)
            i += 1
    if n_bound < len(params):
        raise ProgrammingError(
            f"{len(params)} parameters supplied for {n_bound} placeholders"
        )
    return "".join(out)


# ------------------------------------------------------------------ cursor
class Cursor:
    """Lazily-paging DBAPI cursor over /v1/statement."""

    arraysize = 1000

    def __init__(self, conn: "Connection"):
        self._conn = conn
        self._buffer: list[list] = []
        self._next_uri: str | None = None
        self._columns: list[dict] = []
        self._converters: list = []
        self._closed = False
        self.rowcount = -1
        self._rows_seen = 0

    # -- DBAPI surface -----------------------------------------------------
    @property
    def description(self):
        if not self._columns:
            return None
        return [(c["name"], c["type"], None, None, None, None, None) for c in self._columns]

    def execute(self, sql: str, params=None) -> "Cursor":
        self._check_open()
        self._buffer = []
        self._columns = []
        self.rowcount = -1
        self._rows_seen = 0
        resp = self._conn._post(_bind(sql, params))
        self._ingest(resp)
        # Follow pages until columns are known (QUEUED first page has none).
        while not self._columns and self._next_uri:
            self._ingest(self._conn._get(self._next_uri))
        return self

    def executemany(self, sql: str, seq_of_params) -> "Cursor":
        for p in seq_of_params:
            self.execute(sql, p)
        return self

    def fetchone(self):
        self._check_open()
        while not self._buffer and self._next_uri:
            self._ingest(self._conn._get(self._next_uri))
        if not self._buffer:
            return None
        return self._buffer.pop(0)

    def fetchmany(self, size: int | None = None) -> list:
        size = self.arraysize if size is None else size
        rows = []
        while len(rows) < size:
            r = self.fetchone()
            if r is None:
                break
            rows.append(r)
        return rows

    def fetchall(self) -> list:
        rows = []
        while True:
            r = self.fetchone()
            if r is None:
                break
            rows.append(r)
        self.rowcount = self._rows_seen
        return rows

    def __iter__(self):
        while True:
            r = self.fetchone()
            if r is None:
                return
            yield r

    def setinputsizes(self, sizes) -> None:  # PEP 249 mandated no-op
        pass

    def setoutputsize(self, size, column=None) -> None:  # PEP 249 no-op
        pass

    def cancel(self) -> None:
        """Abandon remaining pages (DELETE nextUri — Query.java cancel)."""
        if self._next_uri:
            self._conn._delete(self._next_uri)
            self._next_uri = None

    def close(self) -> None:
        if not self._closed:
            try:
                self.cancel()
            except Error:
                pass
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ---------------------------------------------------------
    def _check_open(self):
        if self._closed or self._conn._closed:
            raise InterfaceError("cursor is closed")

    def _ingest(self, resp: dict) -> None:
        if "error" in resp:
            self._next_uri = None
            err = resp["error"]
            raise DatabaseError(f"{err.get('errorName', 'QueryError')}: {err.get('message', '')}")
        self._next_uri = resp.get("nextUri")
        if resp.get("columns") and not self._columns:
            self._columns = resp["columns"]
            self._converters = [_converter(c["type"]) for c in self._columns]
        data = resp.get("data")
        if isinstance(data, dict) and "segments" in data:
            # spooled protocol: fetch + decode segment bodies
            decomp = self._conn._codecs()[data.get("encoding", "json")][1]
            for seg in data["segments"]:
                body = self._conn._get_raw(seg["uri"])
                self._buffer.extend(json.loads(decomp(body)))
                self._rows_seen += seg.get("rowCount", 0)
        elif data:
            self._buffer.extend(data)
            self._rows_seen += len(data)
        if any(self._converters):
            for row in self._buffer:
                for i, conv in enumerate(self._converters):
                    if conv is not None and row[i] is not None:
                        row[i] = conv(row[i])
        if self._next_uri is None:
            self.rowcount = self._rows_seen


# -------------------------------------------------------------- connection
class Connection:
    """One engine endpoint; cursors share it (threadsafety=2)."""

    def __init__(
        self,
        url: str,
        spooled: bool = False,
        encoding: str | None = None,
        session_properties: dict[str, str] | None = None,
        user: str | None = None,
    ):
        self._url = url.rstrip("/")
        self._spooled = spooled
        self._encoding = encoding
        self._closed = False
        # X-Trino-User: identifies the request for resource-group
        # selection and access control (ProtocolHeaders.requestUser).
        self.user = user
        # Client-held session state, sent as X-Trino-Session on every
        # request and updated from X-Trino-Set-Session / X-Trino-Clear-
        # Session response headers — the reference protocol's stateless-
        # server session flow (ProtocolHeaders / StatementClientV1).
        self.session_properties: dict[str, str] = dict(session_properties or {})
        # USE responses update these (X-Trino-Set-Catalog/Schema).
        self.catalog: str | None = None
        self.schema: str | None = None
        # Client-held prepared statements (X-Trino-Added-Prepare /
        # X-Trino-Deallocated-Prepare), re-sent on every request.
        self.prepared_statements: dict[str, str] = {}

    def cursor(self) -> Cursor:
        if self._closed:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def execute(self, sql: str, params=None) -> Cursor:
        """Convenience: one-shot cursor (mirrors the reference client's
        single-statement entry point)."""
        return self.cursor().execute(sql, params)

    def commit(self) -> None:
        # Statements auto-commit (the server's engine.sql path); explicit
        # START TRANSACTION/COMMIT flow through execute() as statements.
        pass

    def rollback(self) -> None:
        raise NotSupportedError("use START TRANSACTION / ROLLBACK statements")

    def close(self) -> None:
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- HTTP --------------------------------------------------------------
    def _headers(self) -> dict:
        h = {}
        if self.user:
            h["X-Trino-User"] = self.user
        prefs = []
        if self._encoding:
            prefs.append(self._encoding)
        if self._spooled:
            prefs.append("json+spooled")
        if prefs:
            h["X-Trino-Query-Data-Encoding"] = ",".join(prefs)
        if self.session_properties:
            # values URL-encoded so ',' / '=' survive the comma-joined header
            h["X-Trino-Session"] = ",".join(
                f"{k}={urllib.parse.quote_plus(v)}"
                for k, v in self.session_properties.items()
            )
        if self.prepared_statements:
            h["X-Trino-Prepared-Statement"] = ",".join(
                f"{k}={urllib.parse.quote_plus(v)}"
                for k, v in self.prepared_statements.items()
            )
        return h

    def _post(self, sql: str) -> dict:
        req = urllib.request.Request(
            f"{self._url}/v1/statement",
            data=sql.encode(),
            method="POST",
            headers=self._headers(),
        )
        return self._do(req)

    def _get(self, uri: str) -> dict:
        return self._do(urllib.request.Request(uri))

    def _get_raw(self, uri: str) -> bytes:
        try:
            with urllib.request.urlopen(uri) as r:
                return r.read()
        except urllib.error.URLError as exc:
            raise OperationalError(str(exc)) from exc

    def _delete(self, uri: str) -> None:
        try:
            urllib.request.urlopen(urllib.request.Request(uri, method="DELETE"))
        except urllib.error.HTTPError as exc:
            if exc.code != 404:
                raise OperationalError(str(exc)) from exc
        except urllib.error.URLError as exc:
            raise OperationalError(str(exc)) from exc

    def _do(self, req: urllib.request.Request) -> dict:
        try:
            with urllib.request.urlopen(req) as r:
                ss = r.headers.get("X-Trino-Set-Session")
                if ss and "=" in ss:
                    k, _, v = ss.partition("=")
                    self.session_properties[k.strip()] = urllib.parse.unquote_plus(
                        v.strip()
                    )
                cs = r.headers.get("X-Trino-Clear-Session")
                if cs:
                    self.session_properties.pop(cs.strip(), None)
                if r.headers.get("X-Trino-Set-Catalog"):
                    self.catalog = r.headers["X-Trino-Set-Catalog"]
                if r.headers.get("X-Trino-Set-Schema"):
                    self.schema = r.headers["X-Trino-Set-Schema"]
                ap = r.headers.get("X-Trino-Added-Prepare")
                if ap and "=" in ap:
                    k, _, v = ap.partition("=")
                    self.prepared_statements[k.strip()] = urllib.parse.unquote_plus(v)
                dp = r.headers.get("X-Trino-Deallocated-Prepare")
                if dp:
                    self.prepared_statements.pop(dp.strip(), None)
                return json.loads(r.read())
        except urllib.error.HTTPError as exc:
            try:
                payload = json.loads(exc.read())
            except Exception:
                payload = {}
            raise OperationalError(
                payload.get("error", f"HTTP {exc.code}") if payload else f"HTTP {exc.code}"
            ) from exc
        except urllib.error.URLError as exc:
            raise OperationalError(str(exc)) from exc

    def _codecs(self):
        from trino_spark.server import TrinoHttpServer

        return TrinoHttpServer.segment_codecs()


def connect(
    url: str,
    spooled: bool = False,
    encoding: str | None = None,
    session_properties: dict[str, str] | None = None,
    user: str | None = None,
) -> Connection:
    """PEP 249 module-level constructor.

    `url` is the server base (e.g. `http://127.0.0.1:8080`); `spooled=True`
    requests the spooled-segment protocol, `encoding` a preferred segment
    encoding ('json+zstd' / 'json+zlib') — both negotiated, never required.
    `session_properties` seed the client-held session state sent as
    X-Trino-Session on every request.
    """
    return Connection(
        url,
        spooled=spooled,
        encoding=encoding,
        session_properties=session_properties,
        user=user,
    )
