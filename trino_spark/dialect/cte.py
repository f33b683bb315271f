"""Reused-CTE materialization — the engine's analog of Trino's CTE
materialization (core/trino-main/.../sql/planner/optimizations — Trino
plans each WITH-clause reference as its own subplan unless the common
subexpression is materialized; its fault-tolerant execution mode spools
shared intermediates for exactly this reason).

Spark inlines every WITH reference too: `WITH cross_items AS (...)`
referenced three times becomes three full re-executions of the subplan,
because the surrounding join/aggregate contexts differ so neither
ReusedExchange nor AQE stage reuse fires.  TPC-DS q14/q23/q04-class
queries pay 2-3x the cost of their most expensive CTE.

This pass runs on the final translated Spark SQL of a SELECT statement:

  1. parse the top-level WITH list (token-based, nesting-aware);
  2. count later references of each CTE name;
  3. a CTE referenced >= 2 times (deterministic body, reads a relation)
     is executed ONCE, persisted (MEMORY_AND_DISK — on a cluster large
     intermediates spill to local disk, the spooling analog), and its
     body is replaced by a trivial scan of the cached view — the WITH
     structure is preserved, so no reference rewriting is needed;
  4. caches from a previous top-level statement are unpersisted lazily
     at the next top-level call (recompute-on-miss keeps any still-held
     DataFrame correct — unpersist never changes results in Spark).

At 100 TB this trades one extra write+read of the CTE output against
re-running its subplan N-1 times; for the reduction-heavy CTEs these
queries share (frequent-item lists, per-customer year totals) the
materialized side is orders of magnitude smaller than the rescanned
fact tables, so the trade is strongly favorable — the same argument
Trino's docs make for `retry-policy=TASK` exchange spooling.
"""

from __future__ import annotations

import uuid

from trino_spark.dialect.tokenizer import Tok, tokenize

# Functions whose per-call results differ between executions: a body
# containing any of these must not be evaluated once-and-reused unless
# the query already reuses it by name (which SQL semantics say is one
# evaluation per reference anyway — so materializing would CHANGE
# results for rand() but match Trino for none of them reliably; skip).
_NONDETERMINISTIC = {
    "RAND",
    "RANDOM",
    "RANDN",
    "UUID",
    "SHUFFLE",
    "MONOTONICALLY_INCREASING_ID",
}


def _parse_with(toks: list[Tok]):
    """Parse a leading top-level WITH list. Returns (ctes, main_start)
    where ctes = [(name, name_idx, body_start, body_end)] token-index
    spans of each body's interior, or None if not a plain WITH query.
    """
    i, n = 0, len(toks)

    def skip_ws(j: int) -> int:
        while j < n and toks[j].kind == "WS":
            j += 1
        return j

    i = skip_ws(i)
    if i >= n or not toks[i].is_word("WITH"):
        return None
    i = skip_ws(i + 1)
    if i < n and toks[i].is_word("RECURSIVE"):
        return None  # handled by the recursion rewriter, never here
    ctes = []
    while True:
        i = skip_ws(i)
        if i >= n or toks[i].kind not in ("WORD", "QIDENT"):
            return None
        name_idx = i
        name = toks[i].text.strip('"')
        i = skip_ws(i + 1)
        if i < n and toks[i].is_sym("("):  # optional column alias list
            depth = 0
            while i < n:
                if toks[i].is_sym("("):
                    depth += 1
                elif toks[i].is_sym(")"):
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            i = skip_ws(i + 1)
        if i >= n or not toks[i].is_word("AS"):
            return None
        i = skip_ws(i + 1)
        if i >= n or not toks[i].is_sym("("):
            return None
        body_start = i + 1
        depth = 0
        while i < n:
            if toks[i].is_sym("("):
                depth += 1
            elif toks[i].is_sym(")"):
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if i >= n:
            return None
        body_end = i  # exclusive: toks[body_start:body_end] is the interior
        ctes.append((name, name_idx, body_start, body_end))
        i = skip_ws(i + 1)
        if i < n and toks[i].is_sym(","):
            i += 1
            continue
        return ctes, i


def _text(toks: list[Tok], a: int, b: int) -> str:
    return "".join(t.text for t in toks[a:b])


_AGG_WORDS = {"AVG", "SUM", "COUNT", "MIN", "MAX", "STDDEV", "STDDEV_SAMP", "VARIANCE"}


def _worth_materializing(body_toks: list[Tok], refs: int) -> bool:
    """Materialize only CTEs whose FULL output every reference needs and
    whose output is reduction-small:

      * a global aggregate (depth-0 aggregate call, no depth-0 GROUP BY /
        UNION) -> scalar-ish row, e.g. q14's avg_sales, q23's
        max_store_sales;
      * an INTERSECT-bearing body -> distinct-ed set intersection, e.g.
        q14's cross_items frequent-item list.

    GROUP-BY CTEs (q04/q11/q74 year_total) are deliberately NOT
    materialized: their references carry literal predicates
    (sale_type = 's', dyear = 2001) that Catalyst pushes through the
    inlined plan, pruning far more than reuse saves — measured 1.5 s
    inline vs 21 s materialized on q04 at sf0.1. Trino's planner makes
    the same adaptive call in its CTE-materialization strategy."""
    if refs < 2:
        return False
    has_from = False
    has_intersect = False
    depth0_agg = False
    depth0_group = False
    depth0_union = False
    depth = 0
    for i, t in enumerate(body_toks):
        if t.is_sym("("):
            depth += 1
        elif t.is_sym(")"):
            depth -= 1
        elif t.kind == "WORD":
            u = t.text.upper()
            if u in _NONDETERMINISTIC:
                return False
            if u == "FROM":
                has_from = True
            elif u == "INTERSECT" and depth == 0:
                # depth-0 only: a GROUP-BY body with a nested INTERSECT
                # subquery must stay inline (reference-site predicates
                # prune through the inlined plan).
                has_intersect = True
            elif depth == 0:
                if u in _AGG_WORDS:
                    # only a call: next non-WS token must be '('
                    for t2 in body_toks[i + 1 :]:
                        if t2.kind == "WS":
                            continue
                        if t2.is_sym("("):
                            depth0_agg = True
                        break
                elif u == "GROUP":
                    depth0_group = True
                elif u in ("UNION", "EXCEPT"):
                    depth0_union = True
    if not has_from:
        return False
    global_agg = depth0_agg and not depth0_group and not depth0_union
    return global_agg or has_intersect


def retire(engine) -> None:
    """Unpersist caches created for earlier top-level statements.

    Safe for ALREADY-ANALYZED plans at any time: a dropped cache
    recomputes from lineage, so a DataFrame handle the caller still
    holds stays correct (slower). NOT safe while another statement is
    between its SQL rewrite and Catalyst analysis (the temp view name
    would fail to resolve) — callers must hold engine._cte_lock and
    check engine._cte_active; materialize_reused below does."""
    for df, view in getattr(engine, "_cte_cached", []):
        try:
            df.unpersist(blocking=False)
            engine.spark.catalog.dropTempView(view)
        except Exception:
            pass
    engine._cte_cached = []


def materialize_reused(engine, spark_sql: str):
    """Rewrite `spark_sql` so top-level CTEs referenced >= 2 times scan a
    once-computed cached view. Returns the (possibly unchanged) SQL."""
    if getattr(engine, "session_properties", {}).get(
        "cte_materialization", "true"
    ).lower() in ("false", "0", "off"):
        return spark_sql
    s = spark_sql.lstrip()
    if not s[:4].upper() == "WITH":
        return spark_sql
    toks = tokenize(spark_sql)
    parsed = _parse_with(toks)
    if not parsed:
        return spark_sql
    ctes, main_start = parsed

    # Retire prior statements' caches only when this is a TOP-LEVEL
    # statement (thread-local depth — nested dispatches must not drop
    # views their outer statement still references) AND no OTHER
    # statement is in flight on this shared engine (the HTTP server runs
    # header-less requests concurrently; a concurrent query may have
    # rewritten its SQL to reference a cached view but not yet analyzed
    # it — the one window where dropping the view breaks it). Deferred
    # caches are retired by the next statement that runs alone.
    import threading

    lock = getattr(engine, "_cte_lock", None) or threading.RLock()
    depth = getattr(getattr(engine, "_tls", None), "depth", 1)
    with lock:
        if depth <= 1 and getattr(engine, "_cte_active", 1) <= 1:
            retire(engine)

    # reference counts: WORD/QIDENT occurrences strictly after the CTE's
    # own body (later bodies + main query). Overcounting via same-named
    # columns only risks materializing a once-used CTE — still correct.
    n = len(toks)
    final_bodies: dict[int, str] = {}
    materialized: list[tuple[str, str]] = []  # (name, view) in order
    for ci, (name, name_idx, b0, b1) in enumerate(ctes):
        refs = 0
        for t in toks[b1 + 1 : n]:
            if (t.kind == "WORD" and t.text.upper() == name.upper()) or (
                t.kind == "QIDENT" and t.text.strip('"').upper() == name.upper()
            ):
                refs += 1
        body_toks = toks[b0:b1]
        if not _worth_materializing(body_toks, refs):
            continue
        body_sql = _text(toks, b0, b1)
        prior = []
        for cj in range(ci):
            pname, _, pb0, pb1 = ctes[cj]
            pbody = final_bodies.get(cj, _text(toks, pb0, pb1))
            prior.append(f"{pname} AS ({pbody})")
        exec_sql = (f"WITH {', '.join(prior)} " if prior else "") + body_sql
        try:
            df = engine.spark.sql(exec_sql)
        except Exception:
            # a body that only analyzes in full WITH context (e.g. a
            # correlated name our counter misjudged): leave it inline
            continue
        view = f"__cte_{uuid.uuid4().hex[:8]}_{ci}"
        from pyspark import StorageLevel

        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # eager: one execution, before any reference runs
        df.createOrReplaceTempView(view)
        with lock:
            if not hasattr(engine, "_cte_cached"):
                engine._cte_cached = []
            engine._cte_cached.append((df, view))
        final_bodies[ci] = f"SELECT * FROM {view}"
        materialized.append((name, view))

    if not materialized:
        return spark_sql
    parts = ["WITH "]
    for ci, (name, name_idx, b0, b1) in enumerate(ctes):
        if ci:
            parts.append(", ")
        # preserve any column alias list between name and AS
        parts.append(_text(toks, name_idx, b0 - 1).rstrip())
        parts.append("(" if parts[-1].endswith("AS") else " (")
        parts.append(final_bodies.get(ci, _text(toks, b0, b1)))
        parts.append(")")
    parts.append(" ")
    parts.append(_text(toks, main_start, n))
    return "".join(parts)
