"""Access control + catalog comments: CREATE/DROP/SET ROLE, GRANT/REVOKE,
SHOW ROLES/GRANTS, COMMENT ON TABLE/COLUMN.

Reference: the role/grant statement family (grammar SqlBase.g4 GRANT/
REVOKE/CREATE ROLE/SET ROLE; engine side io.trino.metadata.MetadataManager
+ security AccessControl SPI) and CommentTask.java for COMMENT ON.

Single-session semantics, honestly scoped: roles and grants live on the
engine instance (no external identity provider); with no role set the
session is the table owner (everything allowed — Trino's legacy/allow-all
access control default); after SET ROLE r, SELECT requires a SELECT grant
on every referenced table and DML requires the matching privilege on its
target. Enforcement is at dispatch (the reference checks in analysis —
same observable behavior: AccessDeniedException before execution).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PRIVS = ("SELECT", "INSERT", "UPDATE", "DELETE")


class AccessDenied(PermissionError):
    pass


def _state(engine):
    if not hasattr(engine, "_acl"):
        engine._acl = {
            "roles": {},  # role -> {(priv, table)}
            "current": None,  # None = owner/allow-all
            "table_comments": {},
            "column_comments": {},  # (table, col) -> text
        }
    return engine._acl


def try_execute(engine, sql: str) -> DataFrame | None:
    st = _state(engine)
    s = sql.strip().rstrip(";")
    up = s.upper().split()
    spark = engine.spark

    if up[:2] == ["CREATE", "ROLE"]:
        name = s.split()[2].strip('"').lower()
        if name in st["roles"]:
            raise ValueError(f"role already exists: {name}")
        st["roles"][name] = set()
        return spark.createDataFrame([(name,)], "role: string")
    if up[:2] == ["DROP", "ROLE"]:
        name = s.split()[2].strip('"').lower()
        if name not in st["roles"]:
            raise ValueError(f"role not found: {name}")
        del st["roles"][name]
        if st["current"] == name:
            st["current"] = None
        return spark.createDataFrame([(name,)], "role: string")
    if up[:2] == ["SET", "ROLE"]:
        name = s.split()[2].strip('"').lower()
        if name == "none":
            st["current"] = None
        else:
            if name not in st["roles"]:
                raise ValueError(f"role not found: {name}")
            st["current"] = name
        return spark.createDataFrame([(name,)], "role: string")
    if up[:2] == ["SHOW", "ROLES"]:
        rows = [(r,) for r in sorted(st["roles"])]
        return spark.createDataFrame(rows or [], "role: string")
    if up[:2] == ["SHOW", "GRANTS"]:
        m = re.match(r"SHOW\s+GRANTS\s+ON\s+(?:TABLE\s+)?([\w.\"]+)", s, re.IGNORECASE)
        table = m.group(1).strip('"').split(".")[-1].lower() if m else None
        rows = [
            (role, priv, tbl)
            for role, grants in sorted(st["roles"].items())
            for priv, tbl in sorted(grants)
            if table is None or tbl == table
        ]
        return spark.createDataFrame(rows or [], "grantee: string, privilege: string, table_name: string")
    if up[:1] == ["GRANT"]:
        return _grant_revoke(engine, s, revoke=False)
    if up[:1] == ["REVOKE"]:
        return _grant_revoke(engine, s, revoke=True)
    if up[:3] == ["COMMENT", "ON", "TABLE"]:
        m = re.match(r"COMMENT\s+ON\s+TABLE\s+([\w.\"]+)\s+IS\s+(?:'((?:[^']|'')*)'|(NULL))", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse COMMENT ON TABLE: {s[:80]}")
        tbl = m.group(1).strip('"').split(".")[-1].lower()
        if m.group(3):
            st["table_comments"].pop(tbl, None)
        else:
            st["table_comments"][tbl] = m.group(2).replace("''", "'")
        return spark.createDataFrame([(tbl,)], "table: string")
    if up[:3] == ["COMMENT", "ON", "COLUMN"]:
        m = re.match(
            r"COMMENT\s+ON\s+COLUMN\s+([\w.\"]+)\.(\w+)\s+IS\s+(?:'((?:[^']|'')*)'|(NULL))", s, re.IGNORECASE
        )
        if not m:
            raise ValueError(f"cannot parse COMMENT ON COLUMN: {s[:80]}")
        tbl = m.group(1).strip('"').split(".")[-1].lower()
        key = (tbl, m.group(2).lower())
        if m.group(4):
            st["column_comments"].pop(key, None)
        else:
            st["column_comments"][key] = m.group(3).replace("''", "'")
        return spark.createDataFrame([(f"{key[0]}.{key[1]}",)], "column: string")
    if "system.metadata.table_comments" in s:
        rows = [(t_, c) for t_, c in sorted(st["table_comments"].items())]
        spark.createDataFrame(rows or [], "table_name: string, comment: string").createOrReplaceTempView(
            "_system_metadata_table_comments"
        )
        return engine.sql(s.replace("system.metadata.table_comments", "_system_metadata_table_comments"))
    return None


def _grant_revoke(engine, s: str, revoke: bool) -> DataFrame:
    st = _state(engine)
    kw = "REVOKE" if revoke else "GRANT"
    to_kw = "FROM" if revoke else "TO"
    m = re.match(
        rf"{kw}\s+(ALL(?:\s+PRIVILEGES)?|[\w,\s]+?)\s+ON\s+(?:TABLE\s+)?([\w.\"]+)\s+{to_kw}\s+(?:ROLE\s+)?([\w\"]+)",
        s,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError(f"cannot parse {kw}: {s[:80]}")
    privs_txt, table, role = m.group(1).upper(), m.group(2), m.group(3).strip('"').lower()
    table = table.strip('"').split(".")[-1].lower()
    privs = list(_PRIVS) if privs_txt.startswith("ALL") else [p.strip() for p in privs_txt.split(",")]
    for p in privs:
        if p not in _PRIVS:
            raise ValueError(f"unknown privilege: {p}")
    if role not in st["roles"]:
        raise ValueError(f"role not found: {role}")
    for p in privs:
        if revoke:
            st["roles"][role].discard((p, table))
        else:
            st["roles"][role].add((p, table))
    return engine.spark.createDataFrame([(role, table)], "role: string, table_name: string")


_REL_RX = re.compile(r"\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*)", re.IGNORECASE)
_KEYWORD_RELS = {"unnest", "json_table", "lateral", "values", "table"}


def enforce(engine, sql: str) -> None:
    """Raise AccessDenied when the active role lacks a needed privilege.
    Owner sessions (no SET ROLE) bypass — the allow-all default."""
    st = _state(engine)
    role = st["current"]
    if role is None:
        return
    grants = st["roles"].get(role, set())
    s = sql.strip()
    up = s.upper().split()
    needed: list[tuple[str, str]] = []
    if up[:2] == ["INSERT", "INTO"]:
        needed.append(("INSERT", s.split()[2]))
    elif up[:2] == ["DELETE", "FROM"]:
        needed.append(("DELETE", s.split()[2]))
    elif up[:1] == ["UPDATE"]:
        needed.append(("UPDATE", s.split()[1]))
    for m in _REL_RX.finditer(s):
        name = m.group(1).split(".")[-1].lower()
        if name in _KEYWORD_RELS or name.startswith("__"):
            continue
        if name.startswith(("information_schema", "_system", "system")):
            # information_schema / system tables stay readable under any
            # role (the reference's access control does the same).
            continue
        if up[:2] == ["DELETE", "FROM"] and name == needed[0][1].split(".")[-1].lower():
            continue
        needed.append(("SELECT", name))
    for priv, tbl in needed:
        tbl = tbl.strip('"').split(".")[-1].lower()
        if not engine.spark.catalog.tableExists(tbl) and tbl not in getattr(engine, "dml_tables", {}):
            continue  # not a relation (alias, subquery result, etc.)
        if (priv, tbl) not in grants:
            raise AccessDenied(f"Access Denied: role '{role}' lacks {priv} on {tbl}")


# ---------------------------------------------------------------- CALL
#
# CALL procedures (grammar SqlBase.g4 CALL; reference: connector
# procedures, e.g. system.flush_metadata_cache in trino-hive,
# io.trino.spi.procedure.Procedure). Engine-side registry with the
# built-ins our connectors need: generator-source registration and
# query-log maintenance.


def try_execute_call(engine, sql: str) -> "DataFrame | None":
    m = re.match(r"CALL\s+([\w.]+)\s*\((.*)\)\s*$", sql.strip().rstrip(";"), re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    name = m.group(1).lower().split(".")[-1]
    args = [a.strip() for a in _split_call_args(m.group(2))]
    spark = engine.spark

    def _lit(a: str):
        if a.startswith("'"):
            return a.strip("'")
        if "." in a:
            return float(a)
        return int(a)

    if name == "register_tpch":
        from trino_spark.sources import tpchgen

        sf = float(_lit(args[0])) if args else 1.0
        prefix = _lit(args[1]) if len(args) > 1 else "tpchgen_"
        tpchgen.register_tpch_catalog(spark, sf, prefix=str(prefix))
        return spark.createDataFrame([(f"{prefix}*", sf)], "tables: string, sf: double")
    if name == "register_faker":
        from trino_spark.sources import faker

        view, schema, n = str(_lit(args[0])), str(_lit(args[1])), int(_lit(args[2]))
        seed = int(_lit(args[3])) if len(args) > 3 else 0
        faker.gen(spark, schema, n, seed=seed).createOrReplaceTempView(view)
        return spark.createDataFrame([(view, n)], "table: string, rows: bigint")
    if name == "flush_query_log":
        n = len(getattr(engine, "_query_log", []) or [])
        engine._query_log = []
        return spark.createDataFrame([(n,)], "flushed: bigint")
    raise ValueError(f"procedure not found: {name}")


def _split_call_args(s: str) -> list[str]:
    out, buf, depth, in_str = [], [], 0, False
    for ch in s:
        if ch == "'":
            in_str = not in_str
        if not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(buf))
                buf = []
                continue
        buf.append(ch)
    if "".join(buf).strip():
        out.append("".join(buf))
    return out
