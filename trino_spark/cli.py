"""Interactive SQL CLI — the analog of the reference's `client/trino-cli`
(Console.java / Query.java rendering loop): read statements, run them via
the DBAPI client, render ALIGNED / CSV / TSV / JSON output with a row-count
footer.

Two connection modes:
- `--server URL` talks to a running `TrinoHttpServer`;
- with no server, an IN-PROCESS engine is spun up over `--sf-dir` parquet
  (SparkSession + TrinoEngine + loopback HTTP server), so
  `python -m trino_spark.cli -e "SELECT 1"` works standalone — the same
  convenience as `trino --execute`.
"""

from __future__ import annotations

import argparse
import json
import sys

from trino_spark import client as dbapi


# ------------------------------------------------------------- rendering
def _fmt_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, dict)):
        return json.dumps(v, default=str)
    return str(v)


def render_aligned(columns: list[str], rows: list[list], out=None) -> None:
    """Trino CLI ALIGNED format: ` col | col ` header, dashed rule, right-
    aligned numerics (here: right-align everything that renders numeric)."""
    out = out or sys.stdout
    cells = [[_fmt_cell(v) for v in row] for row in rows]
    widths = [len(c) for c in columns]
    for row in cells:
        for i, s in enumerate(row):
            widths[i] = max(widths[i], len(s))

    def is_num(s: str) -> bool:
        try:
            float(s)
            return True
        except ValueError:
            return False

    numeric = [all(is_num(r[i]) or r[i] == "NULL" for r in cells) if cells else False
               for i in range(len(columns))]
    head = " | ".join(c.center(widths[i]) for i, c in enumerate(columns))
    out.write(" " + head + " \n")
    out.write("-" + "-+-".join("-" * w for w in widths) + "-\n")
    for row in cells:
        line = " | ".join(
            (s.rjust(widths[i]) if numeric[i] else s.ljust(widths[i]))
            for i, s in enumerate(row)
        )
        out.write(" " + line + " \n")
    out.write(f"({len(rows)} row{'' if len(rows) == 1 else 's'})\n")


def render(fmt: str, columns: list[str], rows: list[list], out=None) -> None:
    out = out or sys.stdout
    fmt = fmt.upper()
    if fmt == "ALIGNED":
        render_aligned(columns, rows, out)
    elif fmt in ("CSV", "CSV_HEADER", "TSV", "TSV_HEADER"):
        import csv

        w = csv.writer(out, delimiter="\t" if fmt.startswith("TSV") else ",")
        if fmt.endswith("_HEADER"):
            w.writerow(columns)
        w.writerows([[_fmt_cell(v) if v is not None else "" for v in r] for r in rows])
    elif fmt == "JSON":
        for r in rows:
            out.write(json.dumps(dict(zip(columns, r)), default=str) + "\n")
    else:
        raise ValueError(f"unknown output format: {fmt}")


# ----------------------------------------------------------- statement io
def split_statements(buf: str) -> tuple[list[str], str]:
    """Split on `;` outside single/double-quoted strings and -- comments;
    returns (complete statements, remaining partial input)."""
    stmts, cur = [], []
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c == "'" or c == '"':
            q = c
            cur.append(c)
            i += 1
            while i < n:
                cur.append(buf[i])
                if buf[i] == q and (i + 1 >= n or buf[i + 1] != q):
                    i += 1
                    break
                if buf[i] == q:  # doubled quote stays inside the literal
                    cur.append(buf[i + 1])
                    i += 2
                    continue
                i += 1
        elif c == "-" and buf[i : i + 2] == "--":
            j = buf.find("\n", i)
            j = n if j < 0 else j
            cur.append(buf[i:j])
            i = j
        elif c == ";":
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
            i += 1
        else:
            cur.append(c)
            i += 1
    return stmts, "".join(cur)


def run_statement(conn: dbapi.Connection, sql: str, fmt: str, out=None) -> bool:
    """Execute one statement; render or print the error. True on success."""
    out = out or sys.stdout
    try:
        cur = conn.execute(sql)
        rows = cur.fetchall()
        cols = [d[0] for d in (cur.description or [])]
        render(fmt, cols, rows, out)
        return True
    except dbapi.Error as exc:
        out.write(f"Query failed: {exc}\n")
        return False


# ------------------------------------------------------------------ main
def _inprocess_url(sf_dir: str) -> str:
    from trino_spark.dialect.engine import TrinoEngine
    from trino_spark.server import TrinoHttpServer
    from trino_spark.session import get_spark

    spark = get_spark(app_name="trino_spark_cli")
    eng = TrinoEngine(spark, sf_dir)
    return TrinoHttpServer(eng).start().url()


def main(argv: list[str] | None = None, stdin=None, stdout=None) -> int:
    p = argparse.ArgumentParser(prog="trino-spark", description=__doc__.split("\n")[0])
    p.add_argument("--server", help="engine HTTP endpoint (default: in-process)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="parquet dir for the in-process engine")
    p.add_argument("-e", "--execute", help="run these ;-separated statements and exit")
    p.add_argument("-f", "--file", help="run statements from this file and exit")
    p.add_argument("--user", help="request user (X-Trino-User)")
    p.add_argument("--session", action="append", default=[], metavar="KEY=VALUE",
                   help="session property, repeatable (X-Trino-Session)")
    p.add_argument("--output-format", default="ALIGNED",
                   choices=["ALIGNED", "CSV", "CSV_HEADER", "TSV", "TSV_HEADER", "JSON"])
    args = p.parse_args(argv)
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout

    url = args.server or _inprocess_url(args.sf_dir)
    props = dict(kv.split("=", 1) for kv in args.session if "=" in kv)
    conn = dbapi.connect(url, session_properties=props or None, user=args.user)

    script = None
    if args.execute is not None:
        script = args.execute
    elif args.file:
        with open(args.file) as fh:
            script = fh.read()

    ok = True
    if script is not None:
        stmts, rest = split_statements(script)
        if rest.strip():
            stmts.append(rest.strip())
        for s in stmts:
            ok = run_statement(conn, s, args.output_format, stdout) and ok
        return 0 if ok else 1

    # REPL: accumulate lines until a terminating ';' (Console.java loop)
    buf = ""
    interactive = stdin.isatty() if hasattr(stdin, "isatty") else False
    while True:
        if interactive:
            stdout.write("trino-spark> " if not buf else "          -> ")
            stdout.flush()
        line = stdin.readline()
        if not line:
            # EOF: run any trailing statement without a ';' (piped input)
            if buf.strip():
                ok = run_statement(conn, buf.strip(), args.output_format, stdout) and ok
            break
        if not buf.strip() and line.strip().lower() in ("quit", "exit", "quit;", "exit;"):
            break
        buf += line
        stmts, buf = split_statements(buf)
        for s in stmts:
            ok = run_statement(conn, s, args.output_format, stdout) and ok
    return 0 if ok else 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
