"""Build-time adapter: vendored TPC-DS query text -> the adapted corpus in
trino_spark/queries/tpcds.py.

Reads the reference's public benchmark queries
(testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/) and
applies the documented minimal adaptations (catalog-prefix strip, output
aliases, decimal-output casts — see the generated module docstring). Run
manually when adding queries; the generated module is committed, so the
runtime never reads the reference tree.

Usage: python scripts/adapt_tpcds.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

D = "/root/reference/testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds"
NAMES = [
    "q01", "q02", "q03", "q06", "q07", "q08", "q09", "q12", "q13", "q15",
    "q19", "q20", "q26", "q32", "q34", "q36", "q42", "q46", "q51", "q52",
    "q55", "q61", "q71", "q88", "q89", "q96", "q97", "q98",
    # round 4: multi-CTE monsters + the breadth the generator tables support
    "q04", "q11", "q14a", "q17", "q18", "q23a", "q23b", "q25", "q27", "q28",
    "q31", "q33", "q38", "q43", "q47", "q48", "q50", "q53", "q56", "q59",
    "q60", "q63", "q64", "q65", "q68", "q73", "q74", "q78", "q79", "q86",
    "q87", "q92", "q93",
]

DESCRIPTIONS = {
    "q01": "CTE + correlated scalar subquery over store_returns (customers above 1.2x their store's average return)",
    "q02": "week-seq pivot of web+catalog sales into day-of-week columns, year-over-year self-join at a 53-week offset",
    "q03": "brand revenue by year for one manufacturer, November sales",
    "q06": "state rollup of customers buying items priced 20% above their category average (two nested scalar subqueries)",
    "q07": "demographic-sliced item averages (4-way dim join: demographics, promotion, date, item)",
    "q08": "store net profit restricted to zip prefixes from a 400-literal IN list INTERSECT preferred-customer zips",
    "q09": "five quantity-bucket averages, each chosen by a threshold CASE over its own COUNT subquery (15 scalar subqueries)",
    "q12": "web-channel item revenue + intra-class ratio (q98's shape on web_sales)",
    "q13": "disjunctive demographic x address x price-band triples (heavy OR-of-AND predicate blocks)",
    "q15": "catalog revenue by zip with OR of zip-list / state / price-floor reach conditions",
    "q19": "brand/manufacturer revenue where customer and store zip prefixes differ (6-table join)",
    "q20": "catalog-channel item revenue + intra-class ratio (q98's shape on catalog_sales)",
    "q26": "catalog-channel demographic item averages (q7's shape on catalog_sales)",
    "q32": "excess discount: sales beating 1.3x the item's average discount (correlated scalar subquery, quoted alias with spaces)",
    "q34": "ticket-sized customer groups: per-ticket line counts BETWEEN 15 AND 20 with vehicle/dependents ratios",
    "q36": "gross margin ROLLUP over (category, class) with GROUPING() and rank() within hierarchy level",
    "q42": "category revenue for one manager's items, November 2000",
    "q46": "weekend city purchases where bought city differs from home city (double customer_address join)",
    "q51": "cumulative web vs store revenue per item/day: windowed sums over a FULL OUTER JOIN",
    "q52": "brand extended price, November 2000",
    "q55": "brand revenue for one manager, November 1999",
    "q61": "promotional-channel revenue share: two scalar subqueries cross-joined into a ratio",
    "q71": "brand revenue by time-of-day over a 3-channel UNION ALL (web+catalog+store) at breakfast/dinner",
    "q88": "8 half-hour traffic-count subqueries cross-joined into one row",
    "q89": "monthly category sales vs the rolling category average (window avg over grouped sums)",
    "q96": "traffic count for one half-hour x dependents-count x store-name slice",
    "q97": "store-vs-catalog shopper overlap: grouped channels FULL JOIN + conditional sums",
    "q98": "item revenue and intra-class revenue ratio (window aggregate over aggregate), 30-day window",
    "q04": "3-channel year-over-year customer growth: 6 self-joins of a UNION-ALL year_total CTE",
    "q11": "store-vs-web customer growth ratio: 4 self-joins of a 2-channel year_total CTE",
    "q14a": "cross-channel frequent items (3-way INTERSECT CTE) + average-sales threshold + channel ROLLUP",
    "q17": "sale->return->catalog-repurchase chain with per-channel quantity statistics (stddev/cov)",
    "q18": "catalog demographics averages over a 4-level ROLLUP (two demographics joins)",
    "q23a": "frequent-items x best-customers cross-channel February sales (3-CTE chain, scalar subquery threshold)",
    "q23b": "q23a's chain with per-customer attribution and grouped output",
    "q25": "sale->return->catalog-repurchase profit/loss rollup (3 fact tables, 3 date roles)",
    "q27": "store demographic item averages over a (item, state) ROLLUP with GROUPING()",
    "q28": "six quantity-bucket (avg, count, distinct-count) cells cross-joined into one row",
    "q31": "county-level store-vs-web quarter-over-quarter growth: 6 self-joins of 2 CTEs",
    "q33": "per-manufacturer Electronics revenue across 3 channels (UNION ALL of 3 CTEs)",
    "q38": "customers active in ALL 3 channels in one year: 3-way INTERSECT of (name, date) sets",
    "q43": "per-store day-of-week sales pivot",
    "q47": "store-brand monthly sales vs yearly average with lag/lead neighbors (v1 referenced 3x)",
    "q48": "store quantity total under disjunctive demographic x address x price-band blocks",
    "q50": "store-returns latency buckets (30/60/90/120-day) per store, sale-to-return date deltas",
    "q53": "quarterly manufacturer sales vs manufacturer average (window over grouped sums)",
    "q56": "per-item colored-item revenue across 3 channels (UNION ALL of 3 CTEs)",
    "q59": "week-over-week per-store day-of-week sales ratios: wss CTE self-joined at a 52-week offset",
    "q60": "per-item Music-category revenue across 3 channels",
    "q63": "monthly manager sales vs manager average (window over grouped sums)",
    "q64": "the 18-relation monster: returned store sales x catalog-return-filtered items x two demographic/address/income-band role pairs, self-joined across years",
    "q65": "store-item revenue at most 10% of the store average (two derived aggregates joined)",
    "q68": "per-ticket extended price/tax/list aggregates for 1st-2nd-of-month city buyers",
    "q73": "ticket line-count 1-5 buyer groups (county + buy-potential + vehicle ratio filters)",
    "q74": "store-vs-web net-paid customer growth: 4 self-joins of a 2-channel year_total CTE",
    "q78": "never-returned sales per (year, item, customer) across 3 channels: LEFT JOIN returns IS NULL, 2 more LEFT JOINs",
    "q79": "per-ticket coupon/profit for high-dependency or multi-vehicle weekday shoppers",
    "q86": "web net-paid ROLLUP hierarchy with GROUPING() rank (q36's shape on web_sales)",
    "q87": "store-minus-catalog-minus-web customer-date EXCEPT chain",
    "q92": "web excess discount: discounts beating 1.3x the item average (correlated scalar subquery)",
    "q93": "store sales net of returned quantity for one return reason",
}


def _ravg(sum_expr: str, count_expr: str, digits: int = 3) -> str:
    """Half-up rounding of a decimal average at `digits`, computed from the
    EXACT integer sum: floor((2*S*10^d + n) / (2n)) / 10^d. Both engines
    hold decimal sums exactly, so the quotient is the same rational in
    both; its distance from any non-equal integer is >= 1/(2n), far above
    double error — no tie instability, unlike rounding an engine-computed
    avg (Spark's decimal avg rounds at scale 6, DuckDB's is a double)."""
    p = 10 ** digits
    return (
        f"(floor((2 * CAST(({sum_expr}) * {p} AS BIGINT) + ({count_expr})) "
        f"/ (2e0 * ({count_expr}))) / 1e{digits})"
    )


def _r(expr: str, digits: int) -> str:
    """Tie-free rounding shared by both engines: floor(x*10^k + 0.5)/10^k.
    Spark's round() HALF_UPs the shortest decimal repr while DuckDB rounds
    the binary double — they disagree exactly on the .xxx5 halves that
    decimal-money averages produce constantly (q89 hit one). floor of the
    same double is bit-identical everywhere."""
    p = 10 ** digits
    return f"(floor(({expr}) * {p} + 0.5) / 1e{digits})"


def adapt() -> dict[str, str]:
    out = {}
    for q in NAMES:
        out[q] = open(f"{D}/{q}.sql").read().replace("${database}.${schema}.", "")

    def sub1(q, old, new, n=1):
        assert out[q].count(old) >= n, (q, old)
        out[q] = out[q].replace(old, new, n)

    sub1("q03", ', "sum"("ss_ext_sales_price") "sum_agg"', ', CAST("sum"("ss_ext_sales_price") AS DOUBLE) "sum_agg"')
    sub1("q08", ', "sum"("ss_net_profit")\n', ', CAST("sum"("ss_net_profit") AS DOUBLE) "net_profit"\n')
    sub1("q42", ', "sum"("ss_ext_sales_price")\n', ', CAST("sum"("ss_ext_sales_price") AS DOUBLE) "sum_sales"\n')
    sub1("q52", ', "sum"("ss_ext_sales_price") "ext_price"', ', CAST("sum"("ss_ext_sales_price") AS DOUBLE) "ext_price"')
    sub1("q55", ', "sum"("ss_ext_sales_price") "ext_price"', ', CAST("sum"("ss_ext_sales_price") AS DOUBLE) "ext_price"')
    sub1("q98", ', "i_current_price"\n', ', CAST("i_current_price" AS DOUBLE) "i_current_price"\n')
    sub1("q98", ', "sum"("ss_ext_sales_price") "itemrevenue"', ', CAST("sum"("ss_ext_sales_price") AS DOUBLE) "itemrevenue"')
    rr = '(("sum"("ss_ext_sales_price") * 100) / "sum"("sum"("ss_ext_sales_price")) OVER (PARTITION BY "i_class"))'
    newrr = '(floor((((CAST("sum"("ss_ext_sales_price") AS DOUBLE) * 100) / CAST("sum"("sum"("ss_ext_sales_price")) OVER (PARTITION BY "i_class") AS DOUBLE))) * 1000000 + 0.5) / 1e6)'
    sub1("q98", rr, newrr)
    ratio = '("sum"("ss_net_profit") / "sum"("ss_ext_sales_price"))'
    newratio = '(floor(((CAST("sum"("ss_net_profit") AS DOUBLE) / CAST("sum"("ss_ext_sales_price") AS DOUBLE))) * 1000000 + 0.5) / 1e6)'
    assert out["q36"].count(ratio) == 2
    out["q36"] = out["q36"].replace(ratio, newratio)
    sub1("q51", '(CASE WHEN ("web"."d_date" IS NOT NULL) THEN "web"."d_date" ELSE "store"."d_date" END) "d_date"',
                'CAST((CASE WHEN ("web"."d_date" IS NOT NULL) THEN "web"."d_date" ELSE "store"."d_date" END) AS TIMESTAMP) "d_date"')
    out["q51"] = out["q51"].replace('"web_sales"', '"web_rev"').replace('"store_sales"', '"store_rev"')
    for tbl in ("ws", "ss"):
        old = f'"sum"("sum"("{tbl}_sales_price")) OVER (PARTITION BY "{tbl}_item_sk" ORDER BY "d_date" ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "cume_sales"'
        new = f'CAST("sum"("sum"("{tbl}_sales_price")) OVER (PARTITION BY "{tbl}_item_sk" ORDER BY "d_date" ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "cume_sales"'
        sub1("q51", old, new)
    sub1("q07", ', "avg"("ss_list_price") "agg2"', ', (floor((2 * CAST(("sum"("ss_list_price")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "agg2"')
    sub1("q07", ', "avg"("ss_coupon_amt") "agg3"', ', (floor((2 * CAST(("sum"("ss_coupon_amt")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "agg3"')
    sub1("q07", ', "avg"("ss_sales_price") "agg4"', ', (floor((2 * CAST(("sum"("ss_sales_price")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "agg4"')
    sub1("q13", '"avg"("ss_quantity")\n', '(floor((CAST("avg"("ss_quantity") AS DOUBLE)) * 1000 + 0.5) / 1e3) "avg_qty"\n')
    sub1("q13", ', "avg"("ss_ext_sales_price")\n', ', (floor((2 * CAST(("sum"("ss_ext_sales_price")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "avg_esp"\n')
    sub1("q13", ', "avg"("ss_ext_wholesale_cost")\n', ', (floor((2 * CAST(("sum"("ss_ext_wholesale_cost")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "avg_wcost"\n')
    sub1("q13", ', "sum"("ss_ext_wholesale_cost")\n', ', CAST("sum"("ss_ext_wholesale_cost") AS DOUBLE) "sum_wcost"\n')
    sub1("q19", ', "sum"("ss_ext_sales_price") "ext_price"', ', CAST("sum"("ss_ext_sales_price") AS DOUBLE) "ext_price"')
    sub1("q96", 'SELECT "count"(*)\n', 'SELECT CAST("count"(*) AS BIGINT) "cnt"\n')
    sub1("q96", 'ORDER BY "count"(*) ASC', 'ORDER BY "cnt" ASC')
    out["q97"] = re.sub(r'"sum"\(\(CASE(.*?)END\)\)\s+"(store_only|catalog_only|store_and_catalog)"',
                        lambda m: f'CAST("sum"((CASE{m.group(1)}END)) AS BIGINT) "{m.group(2)}"',
                        out["q97"], flags=re.DOTALL)
    assert out["q97"].count('CAST("sum"') == 3

    sub1("q15", ', "sum"("cs_sales_price")\n', ', CAST("sum"("cs_sales_price") AS DOUBLE) "sum_price"\n')
    sub1("q26", ', "avg"("cs_list_price") "agg2"', ', (floor((2 * CAST(("sum"("cs_list_price")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "agg2"')
    sub1("q26", ', "avg"("cs_coupon_amt") "agg3"', ', (floor((2 * CAST(("sum"("cs_coupon_amt")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "agg3"')
    sub1("q26", ', "avg"("cs_sales_price") "agg4"', ', (floor((2 * CAST(("sum"("cs_sales_price")) * 1000 AS BIGINT) + ("count"(*))) / (2e0 * ("count"(*)))) / 1e3) "agg4"')
    sub1("q32", 'SELECT "sum"("cs_ext_discount_amt") "excess discount amount"',
                'SELECT CAST("sum"("cs_ext_discount_amt") AS DOUBLE) "excess discount amount"')
    sub1("q46", ', "sum"("ss_coupon_amt") "amt"', ', CAST("sum"("ss_coupon_amt") AS DOUBLE) "amt"')
    sub1("q46", ', "sum"("ss_net_profit") "profit"', ', CAST("sum"("ss_net_profit") AS DOUBLE) "profit"')
    sub1("q61", ', ((CAST("promotions" AS DECIMAL(15,4)) / CAST("total" AS DECIMAL(15,4))) * 100)',
                ', (floor((((CAST("promotions" AS DOUBLE) / CAST("total" AS DOUBLE)) * 100)) * 1000000 + 0.5) / 1e6) "promo_pct"')
    sub1("q61", 'SELECT "sum"("ss_ext_sales_price") "promotions"',
                'SELECT CAST("sum"("ss_ext_sales_price") AS DOUBLE) "promotions"')
    sub1("q61", 'SELECT "sum"("ss_ext_sales_price") "total"',
                'SELECT CAST("sum"("ss_ext_sales_price") AS DOUBLE) "total"')
    sub1("q71", ', "sum"("ext_price") "ext_price"', ', CAST("sum"("ext_price") AS DOUBLE) "ext_price"')

    # q02: seven unaliased decimal ratios -> rounded doubles with aliases
    for day in ("sun", "mon", "tue", "wed", "thu", "fri", "sat"):
        sub1("q02",
             f', "round"(("{day}_sales1" / "{day}_sales2"), 2)',
             f', (floor(((CAST("{day}_sales1" AS DOUBLE) / CAST("{day}_sales2" AS DOUBLE))) * 100 + 0.5) / 1e2) "{day}_ratio"')
    # q89: decimal sum + window avg -> doubles (avg over exact double sums,
    # rounded: the two engines sum partition rows in different orders)
    sub1("q89", ', "sum"("ss_sales_price") "sum_sales"',
                ', CAST("sum"("ss_sales_price") AS DOUBLE) "sum_sales"')
    sub1("q89",
         ', "avg"("sum"("ss_sales_price")) OVER (PARTITION BY "i_category", "i_brand", "s_store_name", "s_company_name") "avg_monthly_sales"',
         ', (floor((2 * CAST(("sum"("sum"("ss_sales_price")) OVER (PARTITION BY "i_category", "i_brand", "s_store_name", "s_company_name")) * 1000 AS BIGINT) + ("count"(*) OVER (PARTITION BY "i_category", "i_brand", "s_store_name", "s_company_name"))) / (2e0 * ("count"(*) OVER (PARTITION BY "i_category", "i_brand", "s_store_name", "s_company_name")))) / 1e3) "avg_monthly_sales"')

    # q09: each CASE branch's avg over decimals -> exact-integer rounding
    # (six avg subqueries; the COUNT threshold branches stay verbatim)
    for col in ("ss_ext_discount_amt", "ss_net_paid"):
        out["q09"] = out["q09"].replace(
            f'SELECT "avg"("{col}")',
            f'SELECT floor((2 * CAST("sum"("{col}") * 1000 AS BIGINT) + "count"(*)) / (2e0 * "count"(*))) / 1e3',
        )
    # q12 / q20: q98's adaptations on the web / catalog channel
    for q, pfx in (("q12", "ws"), ("q20", "cs")):
        sub1(q, ', "i_current_price"\n', ', CAST("i_current_price" AS DOUBLE) "i_current_price"\n')
        sub1(q, f', "sum"("{pfx}_ext_sales_price") "itemrevenue"',
                f', CAST("sum"("{pfx}_ext_sales_price") AS DOUBLE) "itemrevenue"')
        rr2 = f'(("sum"("{pfx}_ext_sales_price") * 100) / "sum"("sum"("{pfx}_ext_sales_price")) OVER (PARTITION BY "i_class"))'
        newrr2 = f'(floor((((CAST("sum"("{pfx}_ext_sales_price") AS DOUBLE) * 100) / CAST("sum"("sum"("{pfx}_ext_sales_price")) OVER (PARTITION BY "i_class") AS DOUBLE))) * 1000000 + 0.5) / 1e6)'
        sub1(q, rr2, newrr2)
    return out


_MODULE_HEADER = '''"""TPC-DS corpus through the dialect engine.

The reference vendors 103 TPC-DS benchmark queries
(testing/trino-benchmark-queries/src/main/resources/sql/trino/tpcds/
q01.sql ...) and benchmarks them via Benchto
(testing/trino-benchto-benchmarks/.../tpcds.yaml). This module runs a
grammar-heavy {n}-query subset VERBATIM as Trino SQL text through
``TrinoEngine.sql`` — CTE chains (q1, q2, q97), INTERSECT (q8), GROUP BY
ROLLUP + GROUPING() + rank() (q36), windowed aggregates over FULL OUTER
JOIN (q51, q97) and over grouped sums (q89, q98), correlated scalar
subqueries (q1, q6, q32), disjunctive predicate blocks (q13),
many-subquery cross joins (q61, q88), day-of-week pivots with
year-over-year self-joins (q2), 3-channel UNION ALL (q71), quoted
identifiers (including an alias with spaces, q32) and DECIMAL literals
throughout — against the deterministic generator tables of
sources/tpcdsgen.py, with DuckDB running the SAME text over the SAME
materialized parquet as the oracle.

GENERATED by scripts/adapt_tpcds.py — documented adaptations (each
applied identically to both engines, so the comparison stays
meaningful): catalog-prefix strip; tpcds_ view-name qualification (the
testdata `customer` view would otherwise collide); surfaced DECIMAL
aggregates cast to DOUBLE (avgs/ratios rounded) because Spark returns
Decimal objects where DuckDB's pandas bridge returns float64 and
decimal avg/division scale rules differ; explicit aliases on unaliased
outputs (the driver's comparator matches columns by name); q97 integer
CASE-sums cast to BIGINT (DuckDB widens to HUGEINT); q51 d_date cast to
TIMESTAMP + its column aliases renamed out of the table-qualifier's way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_spark.queries.base import QueryRegistry

REG = QueryRegistry()


def _engine(spark: SparkSession, sf: str):
    """Shared per-(session, sf_dir) engine + tpcds view registration."""
    from trino_spark.queries.base import engine_for
    from trino_spark.sources import tpcdsgen

    eng = engine_for(spark, sf)
    tpcdsgen.register_tpcds(spark)
    return eng


def _oracle(text: str) -> str:
    from trino_spark.sources import tpcdsgen

    t = tpcdsgen.qualify(text).strip()
    prelude = tpcdsgen.oracle_prelude()
    if t.upper().startswith("WITH"):
        return "WITH " + prelude + ", " + t[4:].lstrip()
    return "WITH " + prelude + " " + t


def _add(name: str, text: str, doc: str) -> None:
    def run(spark: SparkSession, sf: str, _text=text) -> DataFrame:
        from trino_spark.sources import tpcdsgen

        return _engine(spark, sf).sql(tpcdsgen.qualify(_text))

    run.__name__ = f"tpcds_{{name}}"
    run.__doc__ = doc
    REG.add(f"tpcds_{{name}}", _oracle(text))(run)


'''


def emit_module(qs: dict[str, str]) -> str:
    parts = [_MODULE_HEADER.format(n=len(qs), sf="{sf}", name="{name}")]
    for name in sorted(qs):
        doc = DESCRIPTIONS[name]
        parts.append(
            f'_TEXT_{name.upper()} = r"""\n{qs[name].strip()}\n"""\n\n'
            f'_add("{name}", _TEXT_{name.upper()}, "TPC-DS {name}: {doc} '
            f'(vendored: testing/trino-benchmark-queries/.../tpcds/{name}.sql).")\n\n'
        )
    return "\n".join(parts)


def main() -> None:
    qs = adapt()
    json.dump(qs, open("/tmp/tpcds_adapted.json", "w"), indent=0)
    target = Path(__file__).resolve().parent.parent / "trino_spark" / "queries" / "tpcds.py"
    target.write_text(emit_module(qs))
    print(f"adapted {len(qs)} queries -> {target}")


if __name__ == "__main__":
    main()
