"""TPC-H generator source: deterministic synthetic tables at any scale
factor, produced directly from ``spark.range`` — no files, no shuffle.

The reference ships this as a connector (plugin/trino-tpch/.../
TpchMetadata.java:102 + the dbgen-port row generators in
io.trino.tpch): `SELECT * FROM tpch.sf100.lineitem` materializes rows on
demand, split-parallel. The Spark-first equivalent is a `spark.range(n)`
per table with every column a deterministic pure expression of the row id
(xxhash64-seeded), so:

- generation is embarrassingly parallel (range splits = partitions, no
  exchange anywhere in the plan — at 1000 executors a sf100k lineitem is
  just more splits);
- the same (table, sf) always yields byte-identical data, so differential
  oracles can re-derive aggregates over `generate_series` in DuckDB;
- column pruning costs nothing (unused generator expressions are pruned by
  Catalyst before codegen).

Schemas mirror the driver testdata tables (TESTDATA.md), NOT full dbgen:
this is a generator for the engine's own table layout, with TPC-H-like
cardinality scaling (orders = 1.5M x sf, lineitem ~ 4/order, customer =
150k x sf, part = 200k x sf, supplier = 10k x sf).

Row-count / content contracts (the oracle-checkable parts):
- orders rows   = round(1_500_000 * sf); o_orderkey = row id
- lineitem rows = sum over orderkey of (1 + orderkey % 7)  [1..7 lines]
- customer rows = round(150_000 * sf); supplier = round(10_000 * sf);
  part = round(200_000 * sf); nation = 25; region = 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
_TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]

SCALE = {"customer": 150_000, "supplier": 10_000, "part": 200_000, "orders": 1_500_000}


def _u(seed: str, *cols) -> F.Column:
    """Deterministic uniform double in [0,1) from (seed, cols...)."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)).cast("double")


def _pick(seed: str, key, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(F.xxhash64(F.lit(seed), key), F.lit(len(values))) + 1).cast("int"))


def rows_for(table: str, sf: float) -> int:
    if table == "region":
        return 5
    if table == "nation":
        return 25
    if table in SCALE:
        return max(1, round(SCALE[table] * sf))
    raise ValueError(f"tpchgen: unknown or derived table {table}")


def gen_table(spark: SparkSession, name: str, sf: float = 1.0, parallelism: int | None = None) -> DataFrame:
    """Generate one table at scale factor `sf` as a lazy DataFrame."""
    builders = {
        "region": _region,
        "nation": _nation,
        "customer": _customer,
        "supplier": _supplier,
        "part": _part,
        "orders": _orders,
        "lineitem": _lineitem,
    }
    if name not in builders:
        raise ValueError(f"tpchgen: unknown table {name}")
    return builders[name](spark, sf, parallelism)


def _range(spark: SparkSession, n: int, parallelism: int | None) -> DataFrame:
    if parallelism:
        return spark.range(0, n, 1, parallelism)
    return spark.range(n)


def _region(spark, sf, par):
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(_REGIONS)], "r_regionkey: int, r_name: string"
    )


def _nation(spark, sf, par):
    return _range(spark, 25, par).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("nation_"), F.col("id")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey"),
    )


def _customer(spark, sf, par):
    k = F.col("id")
    return _range(spark, rows_for("customer", sf), par).select(
        k.alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(k.cast("string"), 9, "0")).alias("c_name"),
        F.pmod(F.xxhash64(F.lit("c_nat"), k), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(_u("c_bal", k) * 11000.0 - 1000.0, 2).alias("c_acctbal"),
        _pick("c_seg", k, _SEGMENTS).alias("c_mktsegment"),
    )


def _supplier(spark, sf, par):
    k = F.col("id")
    return _range(spark, rows_for("supplier", sf), par).select(
        k.alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(k.cast("string"), 9, "0")).alias("s_name"),
        F.pmod(F.xxhash64(F.lit("s_nat"), k), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(_u("s_bal", k) * 11000.0 - 1000.0, 2).alias("s_acctbal"),
    )


def _part(spark, sf, par):
    k = F.col("id")
    return _range(spark, rows_for("part", sf), par).select(
        k.alias("p_partkey"),
        F.concat(F.lit("part_"), k).alias("p_name"),
        _pick("p_brand", k, _BRANDS).alias("p_brand"),
        _pick("p_type", k, _TYPES).alias("p_type"),
        (F.pmod(F.xxhash64(F.lit("p_size"), k), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + _u("p_price", k) * 1200.0, 2).alias("p_retailprice"),
    )


_EPOCH = "1992-01-01"
_ORDER_DAYS = 2400  # ~6.5 years, mirrors dbgen's 1992..1998 window


def _orders(spark, sf, par):
    k = F.col("id")
    n_cust = rows_for("customer", sf)
    day = F.pmod(F.xxhash64(F.lit("o_day"), k), F.lit(_ORDER_DAYS)).cast("int")
    return _range(spark, rows_for("orders", sf), par).select(
        k.alias("o_orderkey"),
        F.pmod(F.xxhash64(F.lit("o_cust"), k), F.lit(n_cust)).alias("o_custkey"),
        _pick("o_stat", k, ["O", "F", "P"]).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u("o_price", k) * 450_000.0, 2).alias("o_totalprice"),
        F.to_timestamp(F.date_add(F.lit(_EPOCH).cast("date"), day)).alias("o_orderdate"),
        _pick("o_prio", k, _PRIORITIES).alias("o_orderpriority"),
    )


def _lineitem(spark, sf, par):
    """lineitem derives from orders: each orderkey fans out to
    1 + (orderkey % 7) lines via posexplode of a sequence — still pure
    expressions, one narrow explode, no shuffle."""
    n_part = rows_for("part", sf)
    n_supp = rows_for("supplier", sf)
    o = _range(spark, rows_for("orders", sf), par).select(
        F.col("id").alias("l_orderkey"),
        F.pmod(F.xxhash64(F.lit("o_day"), F.col("id")), F.lit(_ORDER_DAYS)).cast("int").alias("_oday"),
    )
    lines = o.select(
        "l_orderkey",
        "_oday",
        F.posexplode(F.sequence(F.lit(1), (F.pmod(F.col("l_orderkey"), F.lit(7)) + 1).cast("int"))).alias(
            "_pos", "l_linenumber"
        ),
    )
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    qty = (F.pmod(F.xxhash64(F.lit("l_qty"), k, ln), F.lit(50)) + 1).cast("double")
    price = F.round(F.lit(900.0) + _u("l_price", k, ln) * 100_000.0, 2)
    return lines.select(
        k,
        F.pmod(F.xxhash64(F.lit("l_part"), k, ln), F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64(F.lit("l_supp"), k, ln), F.lit(n_supp)).alias("l_suppkey"),
        ln.cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        price.alias("l_extendedprice"),
        (F.pmod(F.xxhash64(F.lit("l_disc"), k, ln), F.lit(11)) / F.lit(100.0)).alias("l_discount"),
        (F.pmod(F.xxhash64(F.lit("l_tax"), k, ln), F.lit(9)) / F.lit(100.0)).alias("l_tax"),
        _pick("l_rf", F.xxhash64(k, ln), ["A", "N", "R"]).alias("l_returnflag"),
        _pick("l_ls", F.xxhash64(k, ln), ["O", "F"]).alias("l_linestatus"),
        F.to_timestamp(
            F.date_add(F.lit(_EPOCH).cast("date"), F.col("_oday") + (F.pmod(F.xxhash64(F.lit("l_ship"), k, ln), F.lit(120)) + 1).cast("int"))
        ).alias("l_shipdate"),
    )


def register_tpch_catalog(spark: SparkSession, sf: float, prefix: str = "tpchgen_") -> None:
    """Register all generated tables as `<prefix><table>` temp views —
    the `tpch.sfN.*` schema surface of the reference connector."""
    for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        gen_table(spark, name, sf).createOrReplaceTempView(f"{prefix}{name}")
