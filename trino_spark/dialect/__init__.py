"""Trino-SQL → Spark-SQL dialect translation.

The reference parses SQL with an ANTLR grammar
(core/trino-grammar/src/main/antlr4/io/trino/grammar/sql/SqlBase.g4) into an
AST; we do not need a full parser because Spark SQL already accepts the
overwhelming majority of the surface (verified by probe: IS [NOT] DISTINCT
FROM, FILTER clauses, IGNORE NULLS, listagg WITHIN GROUP, GROUPING SETS,
lateral/correlated subqueries, interval literals, X'..' literals, VALUES,
position(IN), reduce/transform lambdas, ...). What remains is a bounded set
of token-level rewrites — renames, argument reorders, and four syntax forms
(FETCH FIRST, TABLESAMPLE BERNOULLI, UNNEST, datetime format patterns) —
implemented over a real tokenizer (never regex over raw SQL: string
literals, comments and quoted identifiers are opaque to every rewrite).
"""

from trino_spark.dialect.engine import TrinoEngine, translate

__all__ = ["TrinoEngine", "translate"]
