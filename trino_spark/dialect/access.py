"""Access control + catalog comments: CREATE/DROP/SET ROLE, GRANT/REVOKE,
SHOW ROLES/GRANTS, COMMENT ON TABLE/COLUMN, row filters + column masks.

Reference: the role/grant statement family (grammar SqlBase.g4 GRANT/
REVOKE/CREATE ROLE/SET ROLE; engine side io.trino.metadata.MetadataManager
+ security AccessControl SPI) and CommentTask.java for COMMENT ON. Row
filters and column masks mirror the other half of the SPI —
ConnectorAccessControl.getRowFilters / getColumnMasks (ViewExpression):
per-(role, table) predicates and per-(role, table, column) masking
expressions applied to every read. Trino configures these through access
control plugins (e.g. file-based rules), not DDL, so the engine exposes
them as CALL procedures (add_row_filter / add_column_mask / drop_*).

Single-session semantics, honestly scoped: roles and grants live on the
engine instance (no external identity provider); with no role set the
session is the table owner (everything allowed — Trino's legacy/allow-all
access control default); after SET ROLE r, SELECT requires a SELECT grant
on every referenced table and DML requires the matching privilege on its
target: INSERT/DELETE/UPDATE their own privilege, MERGE all three on the
target (the reference checks checkCanInsert/Delete/Update per clause),
TRUNCATE requires DELETE, and ALTER/DROP/CREATE TABLE require ownership —
proxied here as holding ALL four privileges on the name. Enforcement is
at dispatch (the reference checks in analysis — same observable behavior:
AccessDeniedException before execution).
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
            "row_filters": {},  # (role, table) -> predicate SQL
            "column_masks": {},  # (role, table) -> {col: mask expr SQL}
        }
    # older engine instances may lack the security maps
    engine._acl.setdefault("row_filters", {})
    engine._acl.setdefault("column_masks", {})
    return engine._acl


def _effective_roles(st, role: str) -> set:
    """`role` plus every role transitively granted TO it (GRANT r1 TO
    ROLE r2 makes r2 inherit r1's privileges — the reference's role
    hierarchy, io.trino.metadata.MetadataManager#listApplicableRoles)."""
    out: set = set()
    stack = [role]
    rg = st.get("role_grants", set())
    while stack:
        r = stack.pop()
        if r in out:
            continue
        out.add(r)
        stack.extend(g for g, grantee in rg if grantee == r)
    return out


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
    if up[:3] == ["SHOW", "CURRENT", "ROLES"]:
        # ShowRolesTask with CURRENT: the enabled roles of this session —
        # the SET ROLE plus everything transitively granted to it
        rows = sorted((r,) for r in _effective_roles(st, st["current"])) if st["current"] else []
        return spark.createDataFrame(rows or [], "role: string")
    if up[:3] == ["SHOW", "ROLE", "GRANTS"]:
        # ShowRoleGrants: roles granted NON-recursively to the session
        # identity (docs sql/show-role-grants.md)
        cur = st["current"]
        rows = sorted(
            (g,) for g, grantee in st.get("role_grants", set()) if grantee == cur
        ) if cur else []
        return spark.createDataFrame(rows or [], "role: string")
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
        # role-to-role grant (docs sql/grant-roles.md; GrantRolesTask):
        # GRANT r1 [, r2 ...] TO ROLE r [WITH ADMIN OPTION]
        rg = re.match(
            r"GRANT\s+([\w\"]+(?:\s*,\s*[\w\"]+)*)\s+TO\s+ROLE\s+([\w\"]+)"
            r"(?:\s+WITH\s+ADMIN\s+OPTION)?\s*$",
            s,
            re.IGNORECASE,
        )
        if rg and " ON " not in s.upper():
            if st["current"] is not None:
                raise AccessDenied("Access Denied: only the owner session grants roles")
            grantee = rg.group(2).strip('"').lower()
            if grantee not in st["roles"]:
                raise ValueError(f"role not found: {grantee}")
            granted = []
            for r in rg.group(1).split(","):
                r = r.strip().strip('"').lower()
                if r not in st["roles"]:
                    raise ValueError(f"role not found: {r}")
                if r == grantee or grantee in _effective_roles(st, r):
                    raise ValueError(f"circular role grant: {r} -> {grantee}")
                st.setdefault("role_grants", set()).add((r, grantee))
                granted.append(r)
            return spark.createDataFrame([(g, grantee) for g in granted], "role: string, grantee: string")
        return _grant_revoke(engine, s, revoke=False)
    if up[:1] == ["REVOKE"]:
        rr = re.match(
            r"REVOKE\s+(?:ADMIN\s+OPTION\s+FOR\s+)?([\w\"]+(?:\s*,\s*[\w\"]+)*)"
            r"\s+FROM\s+ROLE\s+([\w\"]+)\s*$",
            s,
            re.IGNORECASE,
        )
        if rr and " ON " not in s.upper():
            if st["current"] is not None:
                raise AccessDenied("Access Denied: only the owner session revokes roles")
            grantee = rr.group(2).strip('"').lower()
            for r in rr.group(1).split(","):
                r = r.strip().strip('"').lower()
                st.setdefault("role_grants", set()).discard((r, grantee))
            return spark.createDataFrame([(grantee,)], "grantee: string")
        return _grant_revoke(engine, s, revoke=True)
    if up[:1] == ["DENY"]:
        # DENY privilege ON t TO role (grammar #deny; DenyTask.java):
        # an explicit deny wins over any grant at enforcement time.
        m = re.match(
            r"DENY\s+(ALL(?:\s+PRIVILEGES)?|[\w,\s]+?)\s+ON\s+(?:TABLE\s+)?([\w.\"]+)\s+TO\s+(?:ROLE\s+)?([\w\"]+)",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse DENY: {s[:80]}")
        privs_txt, table, role = m.group(1).upper(), m.group(2), m.group(3).strip('"').lower()
        table = table.strip('"').split(".")[-1].lower()
        privs = list(_PRIVS) if privs_txt.startswith("ALL") else [p.strip() for p in privs_txt.split(",")]
        for p in privs:
            if p not in _PRIVS:
                raise ValueError(f"unknown privilege: {p}")
        if role not in st["roles"]:
            raise ValueError(f"role not found: {role}")
        st.setdefault("denies", {}).setdefault(role, set()).update((p, table) for p in privs)
        return spark.createDataFrame([(role, table)], "role: string, table_name: string")
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
    Owner sessions (no SET ROLE) bypass — the allow-all default.

    Privilege derivation per statement (reference: the checkCan* methods
    of io.trino.spi.connector.ConnectorAccessControl):
    INSERT/DELETE/UPDATE → their own privilege on the target; MERGE →
    UPDATE+INSERT+DELETE on the target and SELECT on a named USING table;
    TRUNCATE → DELETE; ALTER/DROP/CREATE TABLE [AS] → ownership, proxied
    as ALL four privileges on the name; every referenced relation →
    SELECT."""
    st = _state(engine)
    role = st["current"]
    if role is None:
        return
    eff = _effective_roles(st, role)
    grants = set().union(*(st["roles"].get(r, set()) for r in eff))
    s = sql.strip()
    up = s.upper().split()
    toks = s.split()
    needed: list[tuple[str, str]] = []
    skip_select: set[str] = set()

    def _name(raw: str) -> str:
        return raw.strip('"').split(".")[-1].lower().strip("()")

    if up[:2] == ["INSERT", "INTO"]:
        needed.append(("INSERT", toks[2]))
    elif up[:2] == ["DELETE", "FROM"]:
        needed.append(("DELETE", toks[2]))
        skip_select.add(_name(toks[2]))
    elif up[:1] == ["UPDATE"]:
        needed.append(("UPDATE", toks[1]))
    elif up[:2] == ["MERGE", "INTO"]:
        tgt = toks[2]
        needed += [("UPDATE", tgt), ("INSERT", tgt), ("DELETE", tgt)]
        skip_select.add(_name(tgt))
        um = re.search(r"\bUSING\s+([A-Za-z_][\w.]*)", s, re.IGNORECASE)
        if um:
            needed.append(("SELECT", um.group(1)))
    elif up[:2] == ["TRUNCATE", "TABLE"]:
        needed.append(("DELETE", toks[2]))
    elif up[:2] in (["ALTER", "TABLE"], ["DROP", "TABLE"]) or (
        up[:2] == ["CREATE", "TABLE"]
    ):
        idx = 2
        if up[2:5] == ["IF", "NOT", "EXISTS"] or up[2:4] == ["IF", "EXISTS"]:
            idx = 5 if up[3] == "NOT" else 4
        tgt = toks[idx] if len(toks) > idx else ""
        # Ownership proxy: the role must hold every privilege on the name.
        # A CTAS target does not exist yet, so the not-a-relation skip
        # below must not exempt it.
        for p in _PRIVS:
            needed.append((p, f"!{tgt}" if up[:2] == ["CREATE", "TABLE"] else tgt))
        skip_select.add(_name(tgt))
    for m in _REL_RX.finditer(s):
        name = m.group(1).split(".")[-1].lower()
        if name in _KEYWORD_RELS or name.startswith("__"):
            continue
        # Time-travel / metadata temp views substituted BEFORE enforcement
        # (dml.resolve_time_travel turns `t FOR VERSION AS OF 1` into
        # `t__v1`): check the grant against the BASE table, not the derived
        # view name — a SELECT grant on t must satisfy reads of t's
        # snapshots (previously this always failed as 'SELECT on t__v1').
        tt = re.match(r"(.+?)__(?:v\d+|snapshots)$", name)
        if tt and tt.group(1) in getattr(engine, "dml_tables", {}):
            name = tt.group(1)
        if name.startswith(("information_schema", "_system", "system")):
            # information_schema / system tables stay readable under any
            # role (the reference's access control does the same).
            continue
        if name in skip_select:
            continue
        needed.append(("SELECT", name))
    for priv, tbl in needed:
        must_check = tbl.startswith("!")
        tbl = _name(tbl.lstrip("!"))
        if not tbl:
            continue
        if (
            not must_check
            and not engine.spark.catalog.tableExists(tbl)
            and tbl not in getattr(engine, "dml_tables", {})
        ):
            continue  # not a relation (alias, subquery result, etc.)
        # Derived names (time-travel views t__vN, branch forks t__branch_b)
        # check against the BASE table's grants — a privilege on t covers
        # its snapshots and branches (reference: branch refs share the
        # table's ConnectorAccessControl checks).
        base = re.match(r"(.+?)__(?:v\d+|snapshots|branch_\w+)$", tbl)
        if base and base.group(1) in getattr(engine, "dml_tables", {}):
            tbl = base.group(1)
        denies = set().union(
            *(st.get("denies", {}).get(r, set()) for r in eff)
        ) if st.get("denies") else set()
        if (priv, tbl) in denies:
            # DENY overrides any grant (grammar #deny; DenyTask.java),
            # including one inherited through a granted role.
            raise AccessDenied(f"Access Denied: role '{role}' is denied {priv} on {tbl}")
        if (priv, tbl) not in grants:
            raise AccessDenied(f"Access Denied: role '{role}' lacks {priv} on {tbl}")


# ------------------------------------------------- row filters / column masks


def add_row_filter(engine, role: str, table: str, predicate_sql: str) -> None:
    """Attach a row-filter predicate for (role, table) —
    ConnectorAccessControl.getRowFilters ViewExpression analog."""
    st = _state(engine)
    if st["current"] is not None:
        raise AccessDenied("Access Denied: only the owner session defines security rules")
    if role.lower() not in st["roles"]:
        raise ValueError(f"role not found: {role}")
    st["row_filters"][(role.lower(), table.lower())] = predicate_sql


def add_column_mask(engine, role: str, table: str, column: str, mask_sql: str) -> None:
    """Attach a masking expression for (role, table, column) —
    ConnectorAccessControl.getColumnMasks analog. The expression may
    reference the column itself (e.g. partial redaction)."""
    st = _state(engine)
    if st["current"] is not None:
        raise AccessDenied("Access Denied: only the owner session defines security rules")
    if role.lower() not in st["roles"]:
        raise ValueError(f"role not found: {role}")
    st["column_masks"].setdefault((role.lower(), table.lower()), {})[column.lower()] = mask_sql


def apply_security(engine, sql: str) -> str:
    """Rewrite table references to secured views when the active role has
    a row filter or column mask on them: reads see filtered/masked data,
    exactly like the reference applies ViewExpressions during analysis.
    Applies to every statement whose reads go through this dispatch —
    including the SELECT side of INSERT ... SELECT (the reference also
    filters the read half, not the written rows)."""
    st = _state(engine)
    role = st["current"]
    if role is None:
        return sql
    secured: dict[str, str] = {}
    tables = {t for (r, t) in st["row_filters"] if r == role} | {
        t for (r, t) in st["column_masks"] if r == role
    }
    for tbl in tables:
        # Secure the base table AND any of its time-travel snapshot views
        # (dml.resolve_time_travel substitutes `tbl__vN` before this runs —
        # an old snapshot of a filtered table is still the filtered table).
        refs = {tbl} | {
            m.group(0).lower()
            for m in re.finditer(rf"\b{re.escape(tbl)}__v\d+\b", sql, re.IGNORECASE)
        }
        for ref in refs:
            if not re.search(rf"\b{re.escape(ref)}\b", sql, re.IGNORECASE):
                continue
            from pyspark.sql import functions as F

            from trino_spark.dialect.rewrites import translate

            df = engine.spark.table(ref)
            # Row filter FIRST, against the underlying data — the reference
            # evaluates getRowFilters on real rows and only then masks the
            # surviving rows' columns (a filter referencing a masked column
            # must not see masked values).
            pred = st["row_filters"].get((role, tbl))
            if pred:
                df = df.filter(F.expr(translate(pred)))
            masks = st["column_masks"].get((role, tbl), {})
            if masks:
                df = df.select(
                    *[
                        F.expr(translate(masks[c.lower()])).alias(c) if c.lower() in masks else F.col(c)
                        for c in df.columns
                    ]
                )
            view = f"__sec_{role}_{ref}"
            df.createOrReplaceTempView(view)
            secured[ref] = view
    if not secured:
        return sql
    return rewrite_table_refs(sql, secured)


_REL_TRIGGERS = {"FROM", "JOIN", "INTO", "UPDATE", "TABLE", "USING"}
_REL_CLAUSE_END = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET", "WINDOW",
    "UNION", "INTERSECT", "EXCEPT", "ON", "SET", "WHEN", "FETCH",
    "QUALIFY", "SELECT", "LATERAL", "UNNEST", "TABLESAMPLE",
}


def rewrite_table_refs(sql: str, mapping: dict[str, str]) -> str:
    """Replace table names with secured-view names ONLY in relation
    positions — after FROM / JOIN / INTO / UPDATE / TABLE / USING and after
    a comma inside an open FROM list — so columns, AS-aliases, and CTE
    names that happen to share a secured table's name keep their own
    bindings (a bare word-boundary regex rewrote those too). CTE names
    declared in the statement shadow same-named tables, as in the
    reference's analyzer."""
    from trino_spark.dialect.tokenizer import tokenize

    toks = tokenize(sql)
    sig = [(i, t) for i, t in enumerate(toks) if t.kind != "WS"]

    # CTE / inline-view names: `ident AS (` — these shadow secured tables,
    # but only AFTER their defining body closes (inside its own body a
    # non-recursive CTE's name still binds to the real table, which must
    # therefore still be secured). Map name -> token index of the body's
    # closing paren.
    shadowed: dict[str, int] = {}
    for k in range(len(sig) - 2):
        a, b, c = sig[k][1], sig[k + 1][1], sig[k + 2][1]
        if a.kind in ("WORD", "QIDENT") and b.is_word("AS") and c.is_sym("("):
            open_idx = sig[k + 2][0]
            d = 0
            close_idx = len(toks) - 1
            for j in range(open_idx, len(toks)):
                if toks[j].is_sym("("):
                    d += 1
                elif toks[j].is_sym(")"):
                    d -= 1
                    if d == 0:
                        close_idx = j
                        break
            shadowed[a.text.strip('"').lower()] = close_idx

    out: list[str] = []
    depth = 0
    expecting = False
    expect_kw = ""  # which keyword armed `expecting`
    from_depths: set[int] = set()
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "SYM":
            if t.text == "(":
                # `USING (a, b)` is a join column list, never a relation;
                # `FROM (`/`JOIN (` opens a derived table or join tree —
                # stay armed so `FROM (t1 JOIN t2 …)` still secures t1.
                if expecting and expect_kw == "USING":
                    expecting = False
                depth += 1
            elif t.text == ")":
                from_depths.discard(depth)
                depth -= 1
            elif t.text == ",":
                if depth in from_depths:
                    expecting, expect_kw = True, "FROM"
        elif t.kind in ("WORD", "QIDENT"):
            up = t.text.upper() if t.kind == "WORD" else ""
            if up in _REL_TRIGGERS:
                expecting, expect_kw = True, up
                if up == "FROM":
                    from_depths.add(depth)
            elif up in _REL_CLAUSE_END:
                if up != "SELECT":  # SELECT after FROM( starts a subquery
                    from_depths.discard(depth)
                expecting = False
            elif expecting:
                # Identifier chain word(.word)* — map on its LAST part so
                # qualified refs (schema.tbl) collapse to the secured view.
                j = i
                last = t
                while (
                    j + 2 < len(toks)
                    and toks[j + 1].is_sym(".")
                    and toks[j + 2].kind in ("WORD", "QIDENT")
                ):
                    j += 2
                    last = toks[j]
                key = last.text.strip('"').lower()
                qualified = j > i
                expecting = False
                in_shadow = key in shadowed and i > shadowed[key]
                if key in mapping and (qualified or not in_shadow):
                    out.append(mapping[key])
                    i = j + 1
                    continue
        out.append(t.text)
        i += 1
    return "".join(out)


def dml_target_security(engine, table: str) -> tuple[str | None, dict[str, str]]:
    """(row_filter_sql, column_masks) the active role carries on a DML
    TARGET table. The reference applies ConnectorAccessControl row filters
    to the target scan of UPDATE/DELETE/MERGE too (ViewExpressions bind
    during analysis regardless of statement kind), so a filtered role's DML
    must leave invisible rows untouched — dml.py ANDs this predicate into
    the statement predicate and routes fragments through `mask_fragment`."""
    st = _state(engine)
    role = st["current"]
    if role is None:
        return None, {}
    t = table.lower().split(".")[-1]
    return st["row_filters"].get((role, t)), dict(st["column_masks"].get((role, t), {}))


def mask_fragment(masks: dict[str, str], fragment: str, target: str | None = None) -> str:
    """Substitute masked column references in a user-supplied DML fragment
    (WHERE predicate / SET expression) with their mask expression, so
    `UPDATE t SET other = secret_col` writes the MASKED value — the same
    data the role would see through a read. Row filters, by contrast,
    evaluate on real rows (the reference filters real rows, then masks the
    survivors). Single-pass substitution outside string literals; the mask
    expression's own self-reference is left intact on purpose.

    Qualified references: `target.col` is replaced as one unit (legal
    Trino `DELETE FROM t WHERE t.secret = 5` must not become the invalid
    `t.(CASE ...)`). An alias the fragment itself binds to the protected
    table (`... FROM target s ...`) is treated as the target — otherwise
    `DELETE FROM t WHERE k IN (SELECT s.secret FROM t s)` would probe
    REAL values of a masked column through the subquery. Any REMAINING
    unknown qualifier over a masked column name fails CLOSED
    (AccessDenied): we cannot prove what relation it binds to, and the
    reference's analyzer-level masking never exposes the raw column to a
    masked role under any alias. A bare `col` acting as a qualifier
    itself (`col.x`) stays untouched."""
    if not masks:
        return fragment
    tnames = {target.split(".")[-1].lower()} if target else set()
    # aliases the fragment binds to the protected table: FROM/JOIN
    # <target> [AS] <alias>  (alias must not be a keyword that can
    # follow a relation in this position)
    _KW = {"where", "group", "order", "having", "limit", "join", "inner",
           "left", "right", "full", "cross", "on", "as", "union", "select"}
    for tn in list(tnames):
        for m in re.finditer(
            rf"\b(?:from|join)\s+{re.escape(tn)}\s+(?:as\s+)?(\w+)",
            fragment,
            re.IGNORECASE,
        ):
            alias = m.group(1).lower()
            if alias not in _KW:
                tnames.add(alias)

    def _sub(chunk: str) -> str:
        for col, mexpr in masks.items():
            cq = re.escape(col)
            # alt 1: the whole `<target-or-alias>.col` unit; alt 2: bare
            # `col` not preceded by `qualifier.` and not itself
            # qualifying (`col.x`).
            alts = [rf"(?<![\w.]){cq}\b(?!\s*\.)"]
            if tnames:
                tq = "|".join(re.escape(t) for t in sorted(tnames))
                alts.insert(0, rf"\b(?:{tq})\s*\.\s*{cq}\b(?!\s*\.)")
            chunk = re.sub(
                "|".join(alts), f"({mexpr})", chunk, flags=re.IGNORECASE
            )
            # fail closed: a leftover `unknown.col` over a masked column
            # means a qualifier we could not bind — reject rather than
            # let a subquery alias read the raw column.
            leftover = re.search(
                rf"\b(\w+)\s*\.\s*{cq}\b(?!\s*\.)", chunk, re.IGNORECASE
            )
            if leftover:
                raise AccessDenied(
                    f"Access Denied: cannot verify that qualifier "
                    f"'{leftover.group(1)}' does not expose masked column "
                    f"'{col}'"
                )
        return chunk

    return map_outside_literals(fragment, _sub)


def map_outside_literals(sql: str, fn) -> str:
    """Apply `fn` to every chunk of `sql` OUTSIDE single-quoted string
    literals (shared by the engine's system-table substitution and the
    security rewrite — one literal-skipping implementation)."""
    parts = re.split(r"('(?:[^']|'')*')", sql)
    return "".join(p if p.startswith("'") else fn(p) for p in parts)


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
        if a.startswith("'") and a.endswith("'"):
            return a[1:-1].replace("''", "'")
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
    if name == "add_row_filter":
        add_row_filter(engine, str(_lit(args[0])), str(_lit(args[1])), str(_lit(args[2])))
        return spark.createDataFrame(
            [(str(_lit(args[0])), str(_lit(args[1])))], "role: string, table_name: string"
        )
    if name == "add_column_mask":
        add_column_mask(
            engine, str(_lit(args[0])), str(_lit(args[1])), str(_lit(args[2])), str(_lit(args[3]))
        )
        return spark.createDataFrame(
            [(str(_lit(args[0])), str(_lit(args[1])), str(_lit(args[2])))],
            "role: string, table_name: string, column_name: string",
        )
    if name == "drop_row_filter":
        st = _state(engine)
        st["row_filters"].pop((str(_lit(args[0])).lower(), str(_lit(args[1])).lower()), None)
        return spark.createDataFrame([(str(_lit(args[1])),)], "table_name: string")
    if name == "kill_query":
        # system.runtime.kill_query(query_id, message) — reference:
        # main/connector/system/KillQueryProcedure.java:62. Cancels the
        # Spark job group the HTTP server tagged with the query id; the
        # victim's collect fails and the protocol surfaces FAILED.
        qid = str(_lit(args[0]))
        msg = str(_lit(args[1])) if len(args) > 1 else "killed by operator"
        running = getattr(engine, "_running_queries", {})
        if qid not in running:
            raise ValueError(f"query not found or not running: {qid}")
        # cancelJobGroup only reaches jobs ACTIVE at this instant — a victim
        # still planning (or between jobs) would survive it. Record the kill
        # in a set the server consults around its collect, and cancel future
        # jobs too where the Spark version supports it, so a kill issued at
        # any point after submission terminates the query.
        killed = getattr(engine, "_killed_queries", None)
        if killed is None:
            killed = engine._killed_queries = set()
        killed.add(qid)
        sc = engine.spark.sparkContext
        cancel_future = getattr(sc, "cancelJobGroupAndFutureJobs", None)
        if callable(cancel_future):
            cancel_future(qid)
        else:
            try:
                # PySpark does not surface this method, but the JVM
                # SparkContext has it (Spark >= 3.5): it also cancels jobs
                # the group submits AFTER the call, closing the window
                # where a kill lands between the victim's planning and its
                # first job becoming active.
                sc._jsc.sc().cancelJobGroupAndFutureJobs(qid)
            except Exception:
                sc.cancelJobGroup(qid)
        return spark.createDataFrame([(qid, msg)], "query_id: string, message: string")
    if name == "drop_column_mask":
        st = _state(engine)
        masks = st["column_masks"].get((str(_lit(args[0])).lower(), str(_lit(args[1])).lower()))
        if masks:
            masks.pop(str(_lit(args[2])).lower(), None)
        return spark.createDataFrame([(str(_lit(args[1])),)], "table_name: string")
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
