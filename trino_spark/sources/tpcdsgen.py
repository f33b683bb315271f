"""TPC-DS generator source: deterministic synthetic tables for the
reference's vendored TPC-DS benchmark corpus.

The reference ships TPC-DS twice: as a generator connector
(plugin/trino-tpcds/.../TpcdsMetadata.java) and as 103 vendored benchmark
queries (testing/trino-benchmark-queries/src/main/resources/sql/trino/
tpcds/q01.sql ...). Like sources/tpchgen.py, every table is a
``spark.range`` with pure deterministic column expressions (xxhash64
seeded) — embarrassingly parallel, no shuffle, byte-identical per run.

Sizes are FIXED (not sf-scaled): the corpus queries are correctness
exercises for the dialect engine, and their DuckDB oracles are static SQL
strings, so the data must be identical regardless of the driver's sf_dir.
date_dim follows the real TPC-DS calendar contract: 73,049 days from
1900-01-02, d_date_sk starting at 2,415,022 (the Julian day number dsdgen
uses), d_month_seq = months since 1900-01 — which is what makes the
vendored literals (d_month_seq 1200 = Jan 2000, d_year 1998..2002) land
on generated data.

Money columns are DECIMAL(12,2): decimal aggregation is exact in both
Spark and DuckDB, so sums hash identically across engines — a raw DOUBLE
sum would be partial-aggregation-order dependent and can differ in the
last ulp.

``ensure_materialized`` writes each table once (atomic staging + rename)
under spark-warehouse/tpcds so the DuckDB oracle can read the very same
parquet; concurrent runners generate identical bytes, and the first
rename wins.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# real TPC-DS calendar constants (dsdgen's date_dim contract)
_CAL_START = _dt.date(1900, 1, 2)
_SK0 = 2_415_022
N_DATE = 73_049

N_ITEM = 2_000
N_STORE = 12
N_CUSTOMER = 5_000
N_ADDRESS = 2_500
N_STORE_SALES = 60_000
N_STORE_RETURNS = 12_000
N_WEB_SALES = 30_000
N_CATALOG_SALES = 30_000
N_HOUSEHOLD_DEMO = 7_200
N_CUSTOMER_DEMO = 7_200
N_PROMO = 300
N_TIME = 86_400
N_INCOME_BAND = 20
N_WAREHOUSE = 3
N_WEB_SITE = 4
N_WEB_PAGE = 60
N_CALL_CENTER = 4
N_SHIP_MODE = 6
N_CATALOG_PAGE = 100
#: web/catalog order size: every ORDER_LINES consecutive rows share one
#: order number (q16/q94/q95 probe for a second line of the same order
#: shipped from a DIFFERENT warehouse)
ORDER_LINES = 4
#: weekly inventory snapshots across the sales window
N_INV_WEEKS = 261
#: every RETURN_EVERY-th sales row is returned — return rows recompute the
#: SAME hash formulas at the underlying sales index, so returns join back
#: to their sales on (item, ticket/order) without any shuffle or data read
RETURN_EVERY = 5

#: bump to force regeneration of previously-materialized parquet when the
#: schema or distributions change (checked against a _gen_version marker)
GEN_VERSION = 18

#: store_sales rows per ticket: all rows of a ticket share date/time/
#: store/customer/demographic keys, like dsdgen's multi-line tickets —
#: q34/q46 group on (ss_ticket_number, ss_customer_sk) and need per-ticket
#: line counts
TICKET_LINES = 20

_SALES_START = (_dt.date(1998, 1, 1) - _CAL_START).days
_SALES_SPAN = (_dt.date(2003, 1, 1) - _dt.date(1998, 1, 1)).days  # 1826

_CATEGORIES = [
    "Books", "Children", "Electronics", "Home", "Jewelry",
    "Men", "Music", "Shoes", "Sports", "Women",
]
# dsdgen's real per-category class names (q89 filters on them)
_CLASSES = {  # first five per category are dsdgen names (q89 filters);
    # slots 6-9 add the q53/q63 class literals under Books/Children/
    # Electronics (their filters AND on those categories) + fillers
    "Books": ["computers", "business", "fiction", "history", "home repair",
              "personal", "portable", "reference", "self-help"],
    "Children": ["toddlers", "infants", "newborn", "school-uniforms", "athletic-shoes",
                 "personal", "portable", "refernece", "self-help"],
    "Electronics": ["stereo", "camcorders", "televisions", "audio", "karoke",
                    "personal", "portable", "reference", "self-help"],
    "Home": ["bathroom", "bedding", "curtains/drapes", "blinds/shades", "flatware",
             "decor", "lighting", "mattresses", "paint"],
    "Jewelry": ["birdal", "diamonds", "gold", "estate", "custom",
                "pendants", "rings", "semi-precious", "womens watch"],
    "Men": ["shirts", "pants", "sports-apparel", "accessories", "underwear",
            "shoes", "socks", "belts", "outerwear"],
    "Music": ["rock", "country", "pop", "classical", "jazz",
              "accessories", "fragrances", "pants", "karoke"],
    "Shoes": ["mens", "womens", "kids", "athletic", "work",
              "slippers", "boots", "sandals", "dress"],
    "Sports": ["football", "baseball", "camping", "basketball", "optics",
               "fishing", "golf", "hockey", "tennis"],
    "Women": ["dresses", "fragrances", "maternity", "swimwear", "accessories",
              "classical", "pants", "personal", "portable"],
}
# dsdgen-style brand names; the first eight are q53/q63 filter literals
_BRANDS = [
    "scholaramalgamalg #14", "scholaramalgamalg #7", "exportiunivamalg #9",
    "scholaramalgamalg #9", "amalgimporto #1", "edu packscholar #1",
    "exportiimporto #1", "importoamalg #1", "edu packunivamalg #5",
    "amalgamalg #2", "univmaxi #6", "importoscholar #2", "corpnameless #4",
    "maxinameless #8", "brandbrand #3", "exportischolar #2",
]
# q13's literal states must be reachable
_STATES = [
    "TN", "CA", "TX", "NY", "OH", "GA", "WA", "IL", "NC", "FL",
    "OR", "NM", "KY", "VA", "MS",
]
# subset of q08's literal zip list — guarantees the INTERSECT overlaps
_ZIP_POOL = ["24128", "57834", "13354", "15734", "78668"]
# dsdgen's number-word store names; q96 filters s_store_name = 'ese'
_STORE_NAMES = ["ought", "able", "pri", "ese", "anti", "cally", "ation", "eing"]
_MARITAL = ["M", "S", "W", "D"]
_EDUCATION = ["College", "Advanced Degree", "2 yr Degree", "4 yr Degree", "Unknown",
              "Unknown", "Advanced Degree"]  # weighted: q91/q18 AND-filters on these
_BUY_POTENTIAL = [">10000", "Unknown", "1001-5000", "501-1000", "0-500", "Unknown"]
_CITIES = ["Fairview", "Midway", "Pleasant Hill", "Oak Grove", "Centerville", "Riverside", "Edgewood"]
_FIRST = ["James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael", "Linda"]
_LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller", "Davis"]
_SALUTATION = ["Mr.", "Mrs.", "Ms.", "Dr."]
# q64 / q56 filter literal colors — the pool must include them
# the union of every i_color literal the vendored corpus filters on
# (q24/q41/q56/q64 and friends), plus fillers
_COLORS = [
    "purple", "burlywood", "indian", "spring", "floral", "medium",
    "orange", "lace", "lawn", "misty", "blush", "pink",
    "slate", "blanched", "burnished", "azure", "gainsboro", "rosy",
    "lavender", "honeydew", "brown", "cornflower", "cyan", "deep",
    "forest", "frosted", "ghost", "khaki", "light", "midnight",
    "pale", "papaya", "peach", "powder", "snow", "chiffon",
]
_UNITS = [
    "Box", "Bunch", "Bundle", "Cup", "Dozen", "Dram", "Each", "Gross",
    "Lb", "N/A", "Ounce", "Oz", "Pallet", "Pound", "Tbl", "Ton",
]
_SIZES = ["N/A", "extra large", "large", "medium", "petite", "small", "economy"]
# 30 counties: q31 keeps only counties whose web growth beats store growth
# in BOTH q1->q2 and q2->q3 — a ~1-in-4 per-county coincidence that needs
# enough trials to be reliably non-empty
_COUNTIES = ["Williamson County", "Walker County", "Ziebach County", "Daviess County",
             "Barrow County", "Fairfield County", "Luce County", "Richland County",
             "Bronx County", "Orange County", "Perry County", "Marion County",
             "Jackson County", "Clay County", "Greene County", "Union County",
             "Monroe County", "Madison County", "Wayne County", "Warren County",
             "Adams County", "Butler County", "Carroll County", "Dallas County",
             "Elk County", "Rush County", "Toole County", "Jefferson County",
             "Dona Ana County", "La Porte County"]  # last five: q10 literals
_STREET_NAMES = ["Main", "Oak", "Elm", "Maple", "Cedar", "Pine"]
_STREET_TYPES = ["St", "Ave", "Blvd", "Ct", "Ln"]
_COUNTRIES = ["United States", "Canada", "Mexico", "Germany", "Japan"]

TABLES = (
    "date_dim", "item", "store", "customer", "customer_address",
    "store_sales", "store_returns", "web_sales", "catalog_sales",
    "web_returns", "catalog_returns", "income_band",
    "inventory", "warehouse", "web_site", "web_page", "call_center",
    "ship_mode", "catalog_page",
    "time_dim", "household_demographics", "customer_demographics",
    "promotion", "reason",
)
N_REASON = 35


def _u(seed: str, *cols) -> F.Column:
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)).cast("double")


def _h(seed: str, key, mod: int) -> F.Column:
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(mod))


def _money(seed: str, key, lo: float, hi: float) -> F.Column:
    return F.round(F.lit(lo) + _u(seed, key) * F.lit(hi - lo), 2).cast("decimal(12,2)")


def _pick(seed: str, key, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(seed, key, len(values)) + 1).cast("int"))


def gen_table(spark: SparkSession, name: str, parallelism: int | None = None) -> DataFrame:
    builders = {
        "date_dim": _date_dim,
        "item": _item,
        "store": _store,
        "customer": _customer,
        "customer_address": _customer_address,
        "store_sales": _store_sales,
        "store_returns": _store_returns,
        "web_sales": _web_sales,
        "catalog_sales": _catalog_sales,
        "web_returns": _web_returns,
        "catalog_returns": _catalog_returns,
        "income_band": _income_band,
        "inventory": _inventory,
        "warehouse": _warehouse,
        "web_site": _web_site,
        "web_page": _web_page,
        "call_center": _call_center,
        "ship_mode": _ship_mode,
        "catalog_page": _catalog_page,
        "time_dim": _time_dim,
        "household_demographics": _household_demographics,
        "customer_demographics": _customer_demographics,
        "promotion": _promotion,
        "reason": _reason,
    }
    if name not in builders:
        raise ValueError(f"tpcdsgen: unknown table {name}")
    return builders[name](spark, parallelism)


def _range(spark, n, par):
    return spark.range(0, n, 1, par) if par else spark.range(n)


def _date_dim(spark, par):
    i = F.col("id")
    d = F.date_add(F.lit(str(_CAL_START)).cast("date"), i.cast("int"))
    return _range(spark, N_DATE, par).select(
        (i + _SK0).cast("int").alias("d_date_sk"),
        d.alias("d_date"),
        F.year(d).cast("int").alias("d_year"),
        F.month(d).cast("int").alias("d_moy"),
        F.dayofmonth(d).cast("int").alias("d_dom"),
        F.quarter(d).cast("int").alias("d_qoy"),
        ((F.year(d) - 1900) * 12 + F.month(d) - 1).cast("int").alias("d_month_seq"),
        # 0 = Sunday .. 6 = Saturday (q46 filters weekends via IN (6, 0))
        (F.dayofweek(d) - 1).cast("int").alias("d_dow"),
        F.date_format(d, "EEEE").alias("d_day_name"),
        # Sunday-aligned week counter (q2 pivots by week and joins
        # year-over-year at a 53-week offset); 1900-01-02 was a Tuesday,
        # so day index i=5 (1900-01-07) opens week 2
        ((i + 2) / 7 + 1).cast("int").alias("d_week_seq"),
        F.concat(F.year(d), F.lit("Q"), F.quarter(d)).alias("d_quarter_name"),
    )


def _item(spark, par):
    i = F.col("id")
    q41_pin = F.pmod(i, F.lit(40)) == 11
    cat_id = (
        F.when(i == 0, F.lit(10))  # item 1: Women (q54 pins maternity)
        .when(q41_pin, F.lit(10))
        .otherwise(_h("i_cat", i, len(_CATEGORIES)) + 1)
        .cast("int")
    )
    cat = F.element_at(F.array(*[F.lit(c) for c in _CATEGORIES]), cat_id)
    brand_id = (_h("i_brand", i, 500) + 1).cast("int")
    class_n = (
        F.when(i == 0, F.lit(3))  # Women slot 3 = 'maternity'
        .otherwise(_h("i_class", i, 9) + 1)
        .cast("int")
    )
    # 2-D lookup: class name depends on (category, class slot)
    class_matrix = F.array(
        *[F.array(*[F.lit(c) for c in _CLASSES[cat_name]]) for cat_name in _CATEGORIES]
    )
    class_name = F.element_at(F.element_at(class_matrix, cat_id), class_n)
    return _range(spark, N_ITEM, par).select(
        (i + 1).cast("int").alias("i_item_sk"),
        F.concat(F.lit("ITEM"), F.lpad((i + 1).cast("string"), 8, "0")).alias("i_item_id"),
        F.concat(F.lit("desc of item "), (i + 1)).alias("i_item_desc"),
        brand_id.alias("i_brand_id"),
        _pick("i_brandname", i, _BRANDS).alias("i_brand"),
        class_n.alias("i_class_id"),
        class_name.alias("i_class"),
        cat_id.alias("i_category_id"),
        cat.alias("i_category"),
        # every 100th item carries q32's literal manufacturer id 977 so the
        # correlated-discount query has data to exceed 1.3x the average
        # 1..1000 covers q37/q82/q92's literal ids (677/940/694/808/129/
        # 270/821/423/350); every 100th item still pins q32's 977
        # hot items 2/3 carry the q92/q32 manufacturers: their bulk
        # Feb-2000 rows give the correlated 1.3x-average subquery a
        # populated window (a 0-1-row window can never beat its own avg)
        F.when(i == 1, F.lit(350))
        .when(i == 2, F.lit(977))
        .when(F.pmod(i, F.lit(100)) == 7, F.lit(977))  # q32
        .when(F.pmod(i, F.lit(100)) == 57, F.lit(350))  # q92
        .when(q41_pin, 738 + _h("i_manu41", i, 41))  # q41's 738..778 band
        .otherwise((_h("i_manu", i, 1000) + 1))
        .cast("int")
        .alias("i_manufact_id"),
        F.concat(
            F.lit("manufact_"),
            F.when(F.pmod(i, F.lit(100)) == 7, F.lit(977)).otherwise(_h("i_manu", i, 1000) + 1),
        ).alias("i_manufact"),
        (_h("i_mgr", i, 100) + 1).cast("int").alias("i_manager_id"),
        _money("i_price", i, 0.5, 100.0).alias("i_current_price"),
        F.when(
            q41_pin,
            F.when(F.pmod(i, F.lit(80)) == 11, F.lit("powder")).otherwise(F.lit("khaki")),
        )
        .otherwise(_pick("i_color", i, _COLORS))
        .alias("i_color"),
        F.when(q41_pin, F.lit("medium")).otherwise(_pick("i_size", i, _SIZES)).alias("i_size"),
        F.when(q41_pin, F.lit("Ounce")).otherwise(_pick("i_units", i, _UNITS)).alias("i_units"),
        F.concat(F.lit("product_"), (i + 1)).alias("i_product_name"),
        _money("i_wcost", i, 1.0, 80.0).alias("i_wholesale_cost"),
    )


def _store(spark, par):
    i = F.col("id")
    return _range(spark, N_STORE, par).select(
        (i + 1).cast("int").alias("s_store_sk"),
        F.concat(F.lit("S"), F.lpad((i + 1).cast("string"), 4, "0")).alias("s_store_id"),
        # dsdgen number-word names (q96 filters s_store_name = 'ese')
        F.element_at(
            F.array(*[F.lit(n) for n in _STORE_NAMES]), (F.pmod(i, F.lit(len(_STORE_NAMES))) + 1).cast("int")
        ).alias("s_store_name"),
        # 3 of 4 stores are in TN — q1 / q36 filter s_state = 'TN'
        F.when(F.pmod(i, F.lit(4)) < 3, F.lit("TN")).otherwise(F.lit("CA")).alias("s_state"),
        F.lit("Williamson County").alias("s_county"),  # q34's literal
        F.lit("Unknown").alias("s_company_name"),  # dsdgen's single company
        _pick("s_city", i, _CITIES[:3]).alias("s_city"),
        # most stores in the q61 gmt band
        F.when(F.pmod(i, F.lit(6)) < 5, F.lit(-5.0)).otherwise(F.lit(-6.0))
        .cast("decimal(5,2)")
        .alias("s_gmt_offset"),
        _pick("s_zip", i, _ZIP_POOL).alias("s_zip"),
        F.lit(1).cast("int").alias("s_company_id"),
        (_h("s_mkt", i, 10) + 1).cast("int").alias("s_market_id"),
        # q79 filters s_number_employees BETWEEN 200 AND 295
        (200 + _h("s_emp", i, 100)).cast("int").alias("s_number_employees"),
        (100 + _h("s_stn", i, 899)).cast("string").alias("s_street_number"),
        _pick("s_stna", i, _STREET_NAMES).alias("s_street_name"),
        _pick("s_stty", i, _STREET_TYPES).alias("s_street_type"),
        F.concat(F.lit("Suite "), (_h("s_suite", i, 90) + 10)).alias("s_suite_number"),
    )


def _customer(spark, par):
    i = F.col("id")
    return _range(spark, N_CUSTOMER, par).select(
        (i + 1).cast("int").alias("c_customer_sk"),
        F.concat(F.lit("CUST"), F.lpad((i + 1).cast("string"), 10, "0")).alias("c_customer_id"),
        _pick("c_sal", i, _SALUTATION).alias("c_salutation"),
        _pick("c_first", i, _FIRST).alias("c_first_name"),
        _pick("c_last", i, _LAST).alias("c_last_name"),
        F.when(i < N_HOT_CUSTOMERS, F.lit(1))  # hot customers at address 1
        .otherwise(_h("c_addr", i, N_ADDRESS) + 1)
        .cast("int")
        .alias("c_current_addr_sk"),
        F.when(_h("c_pref", i, 2) == 0, F.lit("Y")).otherwise(F.lit("N")).alias(
            "c_preferred_cust_flag"
        ),
        # 10% of customers carry the pinned (M, Unknown) demographic row
        F.when(_h("c_cdpin", i, 10) == 0, F.lit(1))
        .otherwise(_h("c_cdemo", i, N_CUSTOMER_DEMO) + 1)
        .cast("int")
        .alias("c_current_cdemo_sk"),
        (_h("c_hdemo", i, N_HOUSEHOLD_DEMO) + 1).cast("int").alias("c_current_hdemo_sk"),
        (1924 + _h("c_by", i, 70)).cast("int").alias("c_birth_year"),
        (_h("c_bm", i, 12) + 1).cast("int").alias("c_birth_month"),
        (_h("c_bd", i, 28) + 1).cast("int").alias("c_birth_day"),
        (_h("c_lrd", i, _SALES_SPAN) + _SALES_START + _SK0).cast("int").alias(
            "c_last_review_date_sk"
        ),
        _pick("c_bc", i, _COUNTRIES).alias("c_birth_country"),
        F.concat(F.lit("cust"), (i + 1), F.lit("@example.com")).alias("c_email_address"),
        F.lit(None).cast("string").alias("c_login"),  # dsdgen leaves it NULL
        # first purchase precedes the sales window (q64 joins these to
        # date_dim and compares d_year against the sale year)
        (_h("c_fsd", i, 730) + (_SALES_START - 730) + _SK0).cast("int").alias(
            "c_first_sales_date_sk"
        ),
        (_h("c_fsd", i, 730) + (_SALES_START - 700) + _SK0).cast("int").alias(
            "c_first_shipto_date_sk"
        ),
    )


def _customer_address(spark, par):
    i = F.col("id")
    random_zip = F.lpad((10000 + _h("ca_zr", i, 89999)).cast("string"), 5, "0")
    return _range(spark, N_ADDRESS, par).select(
        (i + 1).cast("int").alias("ca_address_sk"),
        _pick("ca_city", i, _CITIES).alias("ca_city"),
        # address 1 pinned to the stores' own (county, state) so customer
        # geography can coincide with store geography (q54's join)
        F.when(i == 0, F.lit("TN")).otherwise(_pick("ca_st", i, _STATES)).alias("ca_state"),
        # 30% of addresses share q08's hot zips; the rest are uniform
        F.when(_h("ca_zh", i, 10) < 3, _pick("ca_zp", i, _ZIP_POOL)).otherwise(random_zip).alias(
            "ca_zip"
        ),
        F.lit("United States").alias("ca_country"),
        F.when(_h("ca_gmt", i, 10) < 5, F.lit(-5.0))
        .when(_h("ca_gmt", i, 10) < 7, F.lit(-6.0))
        .otherwise(F.lit(-7.0))  # q91 filters -7 (30%)
        .cast("decimal(5,2)")
        .alias("ca_gmt_offset"),
        F.when(i == 0, F.lit("Williamson County"))
        .otherwise(_pick("ca_cnty", i, _COUNTIES))
        .alias("ca_county"),
        (100 + _h("ca_stn", i, 899)).cast("string").alias("ca_street_number"),
        _pick("ca_stna", i, _STREET_NAMES).alias("ca_street_name"),
        _pick("ca_stty", i, _STREET_TYPES).alias("ca_street_type"),
        F.concat(F.lit("Suite "), (_h("ca_suite", i, 90) + 10)).alias("ca_suite_number"),
        _pick("ca_loc", i, ["apartment", "condo", "single family"]).alias("ca_location_type"),
    )


def _sold_date_sk(seed: str, key) -> F.Column:
    return (_h(seed, key, _SALES_SPAN) + _SALES_START + _SK0).cast("int")



# ---- hot-entity alignment -------------------------------------------------
# q23's CTE chain (frequent (item,date) pairs -> best customers -> their
# cross-channel February-2000 purchases) and q17/q25's sale->return->
# repurchase chains need engineered coincidences that uniform hashing
# cannot produce at this scale: every 25th store ticket is a BULK ticket
# (all 20 lines the same hot item, owned by one of 4 hot customers), and
# every 25th catalog/web row buys a hot item as a hot customer on a date
# drawn from Feb-2000 / year-2001 windows. The SAME functions compute the
# overridden keys in the *_returns builders, so returns still join back.
N_HOT_ITEMS = 3
N_HOT_CUSTOMERS = 4
_FEB2000 = (_dt.date(2000, 2, 1) - _CAL_START).days
_Y2001 = (_dt.date(2001, 1, 1) - _CAL_START).days
_DEC1998 = (_dt.date(1998, 12, 1) - _CAL_START).days
_JAN2000W = (_dt.date(2000, 1, 3) - _CAL_START).days  # q58's probe week


def _bulk_ticket(tk) -> F.Column:
    return F.pmod(tk, F.lit(25)) == 3


def _ss_store_sk(tk) -> F.Column:
    """Ticket-level store key; ~2% of tickets have a NULL store — q76's
    null-key store channel (dsdgen also leaves FK gaps)."""
    return (
        F.when(_h("ss_snull", tk, 50) == 0, F.lit(None))
        .otherwise(_h("ss_store", tk, N_STORE) + 1)
        .cast("int")
    )


def _ticket_number(i, tk) -> F.Column:
    """Ticket ids with VARIABLE ticket sizes: 20% of 20-line blocks split
    into five 4-line sub-tickets (same customer/date — five small visits),
    so q73's `cnt BETWEEN 1 AND 5` and q34's `BETWEEN 15 AND 20` both see
    data. Globally unique: block tk owns the id range [tk*6+1, tk*6+5]."""
    line = F.pmod(i, F.lit(TICKET_LINES))
    split = _h("ss_split", tk, 5) == 0
    sub = F.when(split, (line / 4).cast("long")).otherwise(F.lit(0))
    return tk * 6 + sub + 1


def _ss_item_sk(i, tk) -> F.Column:
    return (
        F.when(_bulk_ticket(tk), F.pmod(tk, F.lit(N_HOT_ITEMS)) + 1)
        .otherwise(_h("ss_item", i, N_ITEM) + 1)
        .cast("int")
    )


def _ss_customer_sk(tk) -> F.Column:
    return (
        F.when(_bulk_ticket(tk), F.pmod(tk, F.lit(N_HOT_CUSTOMERS)) + 1)
        .otherwise(_h("ss_cust", tk, N_CUSTOMER) + 1)
        .cast("int")
    )


def _bulk_row(i) -> F.Column:
    return F.pmod(i, F.lit(25)) == 3


def _chan_item_sk(seed: str, i) -> F.Column:
    return (
        F.when(_bulk_row(i), F.pmod(i, F.lit(N_HOT_ITEMS)) + 1)
        .otherwise(_h(seed, i, N_ITEM) + 1)
        .cast("int")
    )


def _chan_customer_sk(seed: str, i) -> F.Column:
    return (
        F.when(_bulk_row(i), F.pmod(i, F.lit(N_HOT_CUSTOMERS)) + 1)
        .otherwise(_h(seed, i, N_CUSTOMER) + 1)
        .cast("int")
    )


_DEC1999 = (_dt.date(1999, 12, 1) - _CAL_START).days  # q14b's last_year week
_DEC2000 = (_dt.date(2000, 12, 1) - _CAL_START).days  # q14b's this_year week
_SEP1999 = (_dt.date(1999, 9, 1) - _CAL_START).days  # q29's sale->return window


def _jan_chan(i) -> F.Column:
    """q58's balanced-channel slice of catalog/web bulk rows: i ≡ 3
    (mod 100) picks EXACTLY 100 rows per hot item per channel (the
    residues cycle through the items), all pinned to the 2000-01-03 week
    at a FIXED price below — the three channel revenues are then equal by
    construction, inside q58's ±10% brackets."""
    return F.pmod(i, F.lit(100)) == 3


def _jan_store(tk) -> F.Column:
    """The store-side slice: tk ≡ 3 (mod 200) → 15 tickets x 20 lines =
    5 tickets per hot item = 100 lines, matching the channel slices."""
    return F.pmod(tk, F.lit(200)) == 3


def _bulk_date(seed: str, key) -> F.Column:
    """Non-probe bulk-row date buckets: Feb-2000 (q23's window), year 2001
    (q17/q25's quarters), Dec-1999 / Dec-2000 (q14b's week-over-year pair),
    Dec-1998 (q54's maternity month)."""
    b = _h(seed + "_w", key, 20)
    return (
        F.when(b < 6, _FEB2000 + _h(seed + "_f", key, 29))
        .when(b < 10, _Y2001 + _h(seed + "_y", key, 365))
        .when(b < 11, _SEP1999 + _h(seed + "_s", key, 60))
        .when(b < 14, _DEC1999 + _h(seed + "_e", key, 25))
        .when(b < 17, _DEC1998 + _h(seed + "_d", key, 25))
        .otherwise(_DEC2000 + _h(seed + "_g", key, 25))
    )


def _chan_date_sk(seed: str, i) -> F.Column:
    return (
        F.when(_bulk_row(i) & _jan_chan(i), _JAN2000W + _h(seed + "_j", i, 5) + _SK0)
        .when(_bulk_row(i), _bulk_date(seed, i) + _SK0)
        .otherwise(_sold_date_sk(seed, i))
        .cast("int")
    )


def _ss_date_sk(tk) -> F.Column:
    """Store ticket dates: bulk tickets follow the same date buckets as the
    bulk catalog/web rows, so cross-channel coincidence queries (q54/q58/
    q14b) find the hot items in all three channels in the probed windows."""
    return (
        F.when(_bulk_ticket(tk) & _jan_store(tk), _JAN2000W + _h("ss_j", tk, 5) + _SK0)
        .when(_bulk_ticket(tk), _bulk_date("ss_day2", tk) + _SK0)
        .otherwise(_sold_date_sk("ss_day", tk))
        .cast("int")
    )


def _ss_addr_sk(tk) -> F.Column:
    """Ticket-level address; ~2% NULL (q44's null-address baseline)."""
    return (
        F.when(_h("ss_anull", tk, 50) == 0, F.lit(None))
        .otherwise(_h("ss_addr", tk, N_ADDRESS) + 1)
        .cast("int")
    )


def _store_sales(spark, par):
    """Ticket-grouped like dsdgen: every TICKET_LINES rows form one ticket
    sharing date/time/store/customer/demographic/address keys (q34/q46
    group on the ticket); item and money columns stay per-line."""
    i = F.col("id")
    tk = (i / TICKET_LINES).cast("long")  # ticket index
    return _range(spark, N_STORE_SALES, par).select(
        _ss_date_sk(tk).alias("ss_sold_date_sk"),
        _h("ss_time", tk, N_TIME).cast("int").alias("ss_sold_time_sk"),
        _ss_item_sk(i, tk).alias("ss_item_sk"),
        _ss_customer_sk(tk).alias("ss_customer_sk"),
        (_h("ss_cdemo", tk, N_CUSTOMER_DEMO) + 1).cast("int").alias("ss_cdemo_sk"),
        (_h("ss_hdemo", tk, N_HOUSEHOLD_DEMO) + 1).cast("int").alias("ss_hdemo_sk"),
        _ss_addr_sk(tk).alias("ss_addr_sk"),
        _ss_store_sk(tk).alias("ss_store_sk"),
        (_h("ss_promo", i, N_PROMO) + 1).cast("int").alias("ss_promo_sk"),
        _ticket_number(i, tk).alias("ss_ticket_number"),
        (_h("ss_qty", i, 100) + 1).cast("int").alias("ss_quantity"),
        _money("ss_price", i, 1.0, 200.0).alias("ss_sales_price"),
        _money("ss_list", i, 1.0, 250.0).alias("ss_list_price"),
        _money("ss_coupon", i, 0.0, 50.0).alias("ss_coupon_amt"),
        F.when(_bulk_ticket(tk) & _jan_store(tk), F.lit(1000.00).cast("decimal(12,2)"))
        .otherwise(_money("ss_ext", i, 1.0, 2000.0))
        .alias("ss_ext_sales_price"),
        _money("ss_paid", i, 1.0, 2000.0).alias("ss_net_paid"),
        _money("ss_disc", i, 0.0, 100.0).alias("ss_ext_discount_amt"),
        _money("ss_wcost", i, 1.0, 1500.0).alias("ss_ext_wholesale_cost"),
        # non-negative range keeps q13's net-profit BETWEEN windows hot
        _money("ss_np", i, 0.0, 300.0).alias("ss_net_profit"),
        _money("ss_wc", i, 1.0, 100.0).alias("ss_wholesale_cost"),
        _money("ss_elp", i, 1.0, 2500.0).alias("ss_ext_list_price"),
        _money("ss_tax", i, 0.0, 180.0).alias("ss_ext_tax"),
    )


def _store_returns(spark, par):
    """Return row j is the return of store_sales row i = j*RETURN_EVERY:
    the key columns recompute store_sales' OWN hash formulas at i, so
    sr joins back to ss on (ss_ticket_number, ss_item_sk) — q17/q25/q64
    chain sale->return->repurchase, and q78's LEFT JOIN ... IS NULL
    isolates never-returned lines. Money columns are fresh draws."""
    j = F.col("id")
    i = j * RETURN_EVERY
    tk = (i / TICKET_LINES).cast("long")
    return _range(spark, N_STORE_SALES // RETURN_EVERY, par).select(
        # returned within ~60 days of the (deterministic) sale date
        (_ss_date_sk(tk) + (_h("sr_delay", j, 60) + 1).cast("int"))
        .cast("int")
        .alias("sr_returned_date_sk"),
        _ss_item_sk(i, tk).alias("sr_item_sk"),
        _ss_customer_sk(tk).alias("sr_customer_sk"),
        _ss_store_sk(tk).alias("sr_store_sk"),
        _ticket_number(i, tk).alias("sr_ticket_number"),
        (_h("sr_qty", j, 10) + 1).cast("int").alias("sr_return_quantity"),
        (_h("sr_reason", j, N_REASON) + 1).cast("int").alias("sr_reason_sk"),
        (_h("ss_cdemo", tk, N_CUSTOMER_DEMO) + 1).cast("int").alias("sr_cdemo_sk"),
        _money("sr_amt", j, 1.0, 20000.0).alias("sr_return_amt"),
        _money("sr_loss", j, 0.0, 200.0).alias("sr_net_loss"),
    )


def _web_sales(spark, par):
    i = F.col("id")
    return _range(spark, N_WEB_SALES, par).select(
        _chan_date_sk("ws_day", i).alias("ws_sold_date_sk"),
        _h("ws_time", i, N_TIME).cast("int").alias("ws_sold_time_sk"),
        _chan_item_sk("ws_item", i).alias("ws_item_sk"),
        _chan_customer_sk("ws_cust", i).alias("ws_bill_customer_sk"),
        (_h("ws_addr", i, N_ADDRESS) + 1).cast("int").alias("ws_bill_addr_sk"),
        (_h("ws_saddr", (i / ORDER_LINES).cast("long"), N_ADDRESS) + 1)
        .cast("int")
        .alias("ws_ship_addr_sk"),  # per ORDER (q94 groups on it)
        (i / ORDER_LINES + 1).cast("long").alias("ws_order_number"),
        # every ORDER_LINES rows share an order; returns recompute the
        # same formula so (order, item) joins resolve
        (_chan_date_sk("ws_day", i) + (_h("ws_shipd", i, 30) + 2).cast("int"))
        .cast("int")
        .alias("ws_ship_date_sk"),
        (_h("ws_site", i, N_WEB_SITE) + 1).cast("int").alias("ws_web_site_sk"),
        (_h("ws_page", i, N_WEB_PAGE) + 1).cast("int").alias("ws_web_page_sk"),
        (_h("ws_wh", i, N_WAREHOUSE) + 1).cast("int").alias("ws_warehouse_sk"),
        (_h("ws_sm", i, N_SHIP_MODE) + 1).cast("int").alias("ws_ship_mode_sk"),
        (_h("ws_shd", i, N_HOUSEHOLD_DEMO) + 1).cast("int").alias("ws_ship_hdemo_sk"),
        # ~2% NULL ship customers: q76's web null-key channel
        F.when(_h("ws_scnull", i, 50) == 0, F.lit(None))
        .otherwise(_h("ws_scust", i, N_CUSTOMER) + 1)
        .cast("int")
        .alias("ws_ship_customer_sk"),
        (_h("ws_promo", i, N_PROMO) + 1).cast("int").alias("ws_promo_sk"),
        _money("ws_shipc", i, 0.0, 150.0).alias("ws_ext_ship_cost"),
        (_h("ws_qty", i, 100) + 1).cast("int").alias("ws_quantity"),
        _money("ws_price", i, 1.0, 200.0).alias("ws_sales_price"),
        _money("ws_list", i, 1.0, 250.0).alias("ws_list_price"),
        F.when(_bulk_row(i) & _jan_chan(i), F.lit(1000.00).cast("decimal(12,2)"))
        .otherwise(_money("ws_ext", i, 1.0, 2000.0))
        .alias("ws_ext_sales_price"),
        F.when(_h("ws_dtail", i, 10) == 0, _money("ws_disct", i, 100.0, 500.0))
        .otherwise(_money("ws_disc", i, 0.0, 40.0))
        .alias("ws_ext_discount_amt"),
        _money("ws_elp", i, 1.0, 2500.0).alias("ws_ext_list_price"),
        _money("ws_ewc", i, 1.0, 1500.0).alias("ws_ext_wholesale_cost"),
        _money("ws_paid", i, 1.0, 2000.0).alias("ws_net_paid"),
        _money("ws_wc", i, 1.0, 100.0).alias("ws_wholesale_cost"),
        _money("ws_np", i, 0.0, 300.0).alias("ws_net_profit"),
    )


def _catalog_sales(spark, par):
    i = F.col("id")
    return _range(spark, N_CATALOG_SALES, par).select(
        _chan_date_sk("cs_day", i).alias("cs_sold_date_sk"),
        _h("cs_time", i, N_TIME).cast("int").alias("cs_sold_time_sk"),
        _chan_item_sk("cs_item", i).alias("cs_item_sk"),
        _chan_customer_sk("cs_cust", i).alias("cs_bill_customer_sk"),
        (_h("cs_cdemo", i, N_CUSTOMER_DEMO) + 1).cast("int").alias("cs_bill_cdemo_sk"),
        (_h("cs_promo", i, N_PROMO) + 1).cast("int").alias("cs_promo_sk"),
        (_h("cs_addr", i, N_ADDRESS) + 1).cast("int").alias("cs_bill_addr_sk"),
        # ~2% NULL ship addresses: q76 counts the null-key channel rows
        F.when(_h("cs_sanull", i, 50) == 0, F.lit(None))
        .otherwise(_h("cs_saddr", (i / ORDER_LINES).cast("long"), N_ADDRESS) + 1)
        .cast("int")
        .alias("cs_ship_addr_sk"),  # per ORDER (q16 groups on it)
        (_h("cs_scust", i, N_CUSTOMER) + 1).cast("int").alias("cs_ship_customer_sk"),
        (i / ORDER_LINES + 1).cast("long").alias("cs_order_number"),
        (_chan_date_sk("cs_day", i) + (_h("cs_shipd", i, 30) + 2).cast("int"))
        .cast("int")
        .alias("cs_ship_date_sk"),
        (_h("cs_cc", i, N_CALL_CENTER) + 1).cast("int").alias("cs_call_center_sk"),
        (_h("cs_cp", i, N_CATALOG_PAGE) + 1).cast("int").alias("cs_catalog_page_sk"),
        (_h("cs_wh", i, N_WAREHOUSE) + 1).cast("int").alias("cs_warehouse_sk"),
        (_h("cs_sm", i, N_SHIP_MODE) + 1).cast("int").alias("cs_ship_mode_sk"),
        (_h("cs_bhd", i, N_HOUSEHOLD_DEMO) + 1).cast("int").alias("cs_bill_hdemo_sk"),
        _money("cs_shipc", i, 0.0, 150.0).alias("cs_ext_ship_cost"),
        _money("cs_paid", i, 1.0, 2000.0).alias("cs_net_paid"),
        _money("cs_paidt", i, 1.0, 2200.0).alias("cs_net_paid_inc_tax"),
        (_h("cs_qty", i, 100) + 1).cast("int").alias("cs_quantity"),
        _money("cs_price", i, 1.0, 200.0).alias("cs_sales_price"),
        _money("cs_list", i, 1.0, 250.0).alias("cs_list_price"),
        _money("cs_coupon", i, 0.0, 50.0).alias("cs_coupon_amt"),
        F.when(_bulk_row(i) & _jan_chan(i), F.lit(1000.00).cast("decimal(12,2)"))
        .otherwise(_money("cs_ext", i, 1.0, 2000.0))
        .alias("cs_ext_sales_price"),
        F.when(_h("cs_dtail", i, 10) == 0, _money("cs_disct", i, 100.0, 500.0))
        .otherwise(_money("cs_disc", i, 0.0, 40.0))
        .alias("cs_ext_discount_amt"),
        _money("cs_elp", i, 1.0, 2500.0).alias("cs_ext_list_price"),
        _money("cs_ewc", i, 1.0, 1500.0).alias("cs_ext_wholesale_cost"),
        _money("cs_wc", i, 1.0, 100.0).alias("cs_wholesale_cost"),
        _money("cs_np", i, 0.0, 300.0).alias("cs_net_profit"),
    )


def _web_returns(spark, par):
    """Return row j is the return of web_sales row i = j*RETURN_EVERY —
    same derivation as _store_returns (q78's LEFT JOIN ... IS NULL)."""
    j = F.col("id")
    i = j * RETURN_EVERY
    return _range(spark, N_WEB_SALES // RETURN_EVERY, par).select(
        (_chan_date_sk("ws_day", i) + (_h("wr_delay", j, 60) + 1).cast("int"))
        .cast("int")
        .alias("wr_returned_date_sk"),
        _chan_item_sk("ws_item", i).alias("wr_item_sk"),
        (i / ORDER_LINES + 1).cast("long").alias("wr_order_number"),
        _chan_customer_sk("ws_cust", i).alias("wr_returning_customer_sk"),
        (_h("ws_addr", i, N_ADDRESS) + 1).cast("int").alias("wr_returning_addr_sk"),
        (_h("ws_page", i, N_WEB_PAGE) + 1).cast("int").alias("wr_web_page_sk"),
        (_h("wr_reason", j, N_REASON) + 1).cast("int").alias("wr_reason_sk"),
        (_h("wr_rcd", j, N_CUSTOMER_DEMO) + 1).cast("int").alias("wr_refunded_cdemo_sk"),
        (_h("wr_rcd", j, N_CUSTOMER_DEMO) + 1).cast("int").alias("wr_returning_cdemo_sk"),
        (_h("wr_rad", j, N_ADDRESS) + 1).cast("int").alias("wr_refunded_addr_sk"),
        (_h("wr_qty", j, 10) + 1).cast("int").alias("wr_return_quantity"),
        _money("wr_amt", j, 1.0, 20000.0).alias("wr_return_amt"),
        _money("wr_loss", j, 0.0, 200.0).alias("wr_net_loss"),
        _money("wr_fee", j, 0.5, 100.0).alias("wr_fee"),
        _money("wr_cash", j, 0.0, 100.0).alias("wr_refunded_cash"),
    )


def _catalog_returns(spark, par):
    """Return row j is the return of catalog_sales row i = j*RETURN_EVERY
    (q64's cs_ui joins cs to cr on item + order_number)."""
    j = F.col("id")
    i = j * RETURN_EVERY
    return _range(spark, N_CATALOG_SALES // RETURN_EVERY, par).select(
        (_chan_date_sk("cs_day", i) + (_h("cr_delay", j, 60) + 1).cast("int"))
        .cast("int")
        .alias("cr_returned_date_sk"),
        _chan_item_sk("cs_item", i).alias("cr_item_sk"),
        (i / ORDER_LINES + 1).cast("long").alias("cr_order_number"),
        _chan_customer_sk("cs_cust", i).alias("cr_returning_customer_sk"),
        (_h("cs_addr", i, N_ADDRESS) + 1).cast("int").alias("cr_returning_addr_sk"),
        (_h("cs_cc", i, N_CALL_CENTER) + 1).cast("int").alias("cr_call_center_sk"),
        (_h("cs_cp", i, N_CATALOG_PAGE) + 1).cast("int").alias("cr_catalog_page_sk"),
        (_h("cr_qty", j, 10) + 1).cast("int").alias("cr_return_quantity"),
        _money("cr_amt", j, 1.0, 20000.0).alias("cr_return_amount"),
        _money("cr_amtt", j, 1.0, 22000.0).alias("cr_return_amt_inc_tax"),
        _money("cr_loss", j, 0.0, 200.0).alias("cr_net_loss"),
        _money("cr_cash", j, 0.0, 100.0).alias("cr_refunded_cash"),
        _money("cr_rev", j, 0.0, 50.0).alias("cr_reversed_charge"),
        _money("cr_credit", j, 0.0, 50.0).alias("cr_store_credit"),
    )


def _inventory(spark, par):
    """Weekly on-hand snapshots: full (week x item x warehouse) cross via
    index arithmetic over one spark.range — q21/q22/q37/q82's fact table.
    At 100 TB the equivalent table partitions by inv_date_sk; the queries
    prune date windows before ever touching item rows."""
    i = F.col("id")
    week = (i / (N_ITEM * N_WAREHOUSE)).cast("long")
    rest = F.pmod(i, F.lit(N_ITEM * N_WAREHOUSE))
    item = (rest / N_WAREHOUSE).cast("long")
    wh = F.pmod(rest, F.lit(N_WAREHOUSE))
    return _range(spark, N_INV_WEEKS * N_ITEM * N_WAREHOUSE, par).select(
        (week * 7 + _SALES_START + _SK0).cast("int").alias("inv_date_sk"),
        (item + 1).cast("int").alias("inv_item_sk"),
        (wh + 1).cast("int").alias("inv_warehouse_sk"),
        # mixture: mostly small stocks, occasional big replenishments —
        # per-(item,warehouse,month) cov then genuinely spans q39's >1 and
        # >1.5 brackets (uniform stock makes cov hug 0.6)
        F.when(_h("inv_big", i, 20) == 0, _h("inv_qohb", i, 5000))
        .otherwise(_h("inv_qoh", i, 300))
        .cast("int")
        .alias("inv_quantity_on_hand"),
    )


def _warehouse(spark, par):
    i = F.col("id")
    return _range(spark, N_WAREHOUSE, par).select(
        (i + 1).cast("int").alias("w_warehouse_sk"),
        F.concat(F.lit("Warehouse_"), (i + 1)).alias("w_warehouse_name"),
        ((i + 1) * 25_000).cast("int").alias("w_warehouse_sq_ft"),
        _pick("w_city", i, _CITIES[:3]).alias("w_city"),
        _pick("w_cnty", i, _COUNTIES[:4]).alias("w_county"),
        _pick("w_st", i, _STATES[:5]).alias("w_state"),
        F.lit("United States").alias("w_country"),
    )


def _web_site(spark, par):
    i = F.col("id")
    return _range(spark, N_WEB_SITE, par).select(
        (i + 1).cast("int").alias("web_site_sk"),
        F.concat(F.lit("WEB"), F.lpad((i + 1).cast("string"), 4, "0")).alias("web_site_id"),
        F.concat(F.lit("site_"), (i + 1)).alias("web_name"),
        F.lit("pri").alias("web_company_name"),  # q94/q95 literal
    )


def _web_page(spark, par):
    i = F.col("id")
    return _range(spark, N_WEB_PAGE, par).select(
        (i + 1).cast("int").alias("wp_web_page_sk"),
        # q90 brackets 5000..5200 — the pool must straddle it
        (4000 + _h("wp_cc", i, 2000)).cast("int").alias("wp_char_count"),
    )


def _call_center(spark, par):
    i = F.col("id")
    return _range(spark, N_CALL_CENTER, par).select(
        (i + 1).cast("int").alias("cc_call_center_sk"),
        F.concat(F.lit("CC"), F.lpad((i + 1).cast("string"), 4, "0")).alias("cc_call_center_id"),
        F.concat(F.lit("center_"), (i + 1)).alias("cc_name"),
        F.concat(F.lit("Manager_"), (i + 1)).alias("cc_manager"),
        F.lit("Williamson County").alias("cc_county"),  # q16 literal
    )


def _ship_mode(spark, par):
    i = F.col("id")
    return _range(spark, N_SHIP_MODE, par).select(
        (i + 1).cast("int").alias("sm_ship_mode_sk"),
        F.element_at(
            F.array(*[F.lit(v) for v in ["EXPRESS", "OVERNIGHT", "REGULAR", "TWO DAY", "NEXT DAY", "LIBRARY"]]),
            (i + 1).cast("int"),
        ).alias("sm_type"),
        # q66 filters carriers IN ('DHL', 'BARIAN')
        F.element_at(
            F.array(*[F.lit(v) for v in ["DHL", "BARIAN", "UPS", "FEDEX", "AIRBORNE", "USPS"]]),
            (i + 1).cast("int"),
        ).alias("sm_carrier"),
    )


def _catalog_page(spark, par):
    i = F.col("id")
    return _range(spark, N_CATALOG_PAGE, par).select(
        (i + 1).cast("int").alias("cp_catalog_page_sk"),
        F.concat(F.lit("CP"), F.lpad((i + 1).cast("string"), 6, "0")).alias("cp_catalog_page_id"),
    )


def _income_band(spark, par):
    i = F.col("id")
    return _range(spark, N_INCOME_BAND, par).select(
        (i + 1).cast("int").alias("ib_income_band_sk"),
        (i * 10_000).cast("int").alias("ib_lower_bound"),
        ((i + 1) * 10_000 - 1).cast("int").alias("ib_upper_bound"),
    )


def _time_dim(spark, par):
    i = F.col("id")
    hour = (i / 3600).cast("int")
    return _range(spark, N_TIME, par).select(
        i.cast("int").alias("t_time_sk"),
        i.cast("int").alias("t_time"),
        hour.alias("t_hour"),
        (F.pmod(i, F.lit(3600)) / 60).cast("int").alias("t_minute"),
        F.pmod(i, F.lit(60)).cast("int").alias("t_second"),
        F.when((hour >= 6) & (hour < 9), F.lit("breakfast"))
        .when((hour >= 17) & (hour < 21), F.lit("dinner"))
        .otherwise(F.lit(None).cast("string"))
        .alias("t_meal_time"),
    )


def _household_demographics(spark, par):
    i = F.col("id")
    return _range(spark, N_HOUSEHOLD_DEMO, par).select(
        (i + 1).cast("int").alias("hd_demo_sk"),
        _pick("hd_buy", i, _BUY_POTENTIAL).alias("hd_buy_potential"),
        _h("hd_dep", i, 10).cast("int").alias("hd_dep_count"),
        (_h("hd_veh", i, 5) - 1).cast("int").alias("hd_vehicle_count"),
        (_h("hd_ib", i, N_INCOME_BAND) + 1).cast("int").alias("hd_income_band_sk"),
    )


def _customer_demographics(spark, par):
    i = F.col("id")
    return _range(spark, N_CUSTOMER_DEMO, par).select(
        (i + 1).cast("int").alias("cd_demo_sk"),
        F.when(F.pmod(i, F.lit(2)) == 0, F.lit("M")).otherwise(F.lit("F")).alias("cd_gender"),
        # SK 1 pinned to (M, Unknown) — q91's AND-pair needs a reliably
        # reachable combination through c_current_cdemo_sk
        F.when(i == 0, F.lit("M")).otherwise(_pick("cd_mar", i, _MARITAL)).alias("cd_marital_status"),
        F.when(i == 0, F.lit("Unknown")).otherwise(_pick("cd_edu", i, _EDUCATION)).alias(
            "cd_education_status"
        ),
        _h("cd_dep", i, 10).cast("int").alias("cd_dep_count"),
        ((_h("cd_pe", i, 20) + 1) * 500).cast("int").alias("cd_purchase_estimate"),
        _pick("cd_cr", i, ["Low Risk", "High Risk", "Good", "Unknown"]).alias("cd_credit_rating"),
        _h("cd_depe", i, 7).cast("int").alias("cd_dep_employed_count"),
        _h("cd_depc", i, 7).cast("int").alias("cd_dep_college_count"),
    )


def _promotion(spark, par):
    i = F.col("id")
    return _range(spark, N_PROMO, par).select(
        (i + 1).cast("int").alias("p_promo_sk"),
        F.concat(F.lit("promo_"), (i + 1)).alias("p_promo_name"),
        F.when(_h("p_em", i, 4) == 0, F.lit("Y")).otherwise(F.lit("N")).alias("p_channel_email"),
        F.when(_h("p_ev", i, 4) == 0, F.lit("Y")).otherwise(F.lit("N")).alias("p_channel_event"),
        F.when(_h("p_dm", i, 4) == 0, F.lit("Y")).otherwise(F.lit("N")).alias("p_channel_dmail"),
        F.when(_h("p_tv", i, 4) == 0, F.lit("Y")).otherwise(F.lit("N")).alias("p_channel_tv"),
    )


def _reason(spark, par):
    i = F.col("id")
    return _range(spark, N_REASON, par).select(
        (i + 1).cast("int").alias("r_reason_sk"),
        F.concat(F.lit("reason "), (i + 1)).alias("r_reason_desc"),  # q93 literal 'reason 28'
    )


def warehouse_dir() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, "spark-warehouse", "tpcds")


def ensure_materialized(spark: SparkSession, base: str | None = None) -> str:
    """Write every table to parquet exactly once (atomic staging+rename;
    deterministic bytes make concurrent generation benign — first rename
    wins, losers discard). Returns the base dir. The DuckDB oracle reads
    these same files via read_parquet()."""
    base = base or warehouse_dir()
    marker = os.path.join(base, "_gen_version")
    if os.path.isdir(base):
        try:
            current = open(marker).read().strip()
        except OSError:
            current = ""
        if current != str(GEN_VERSION):
            shutil.rmtree(base, ignore_errors=True)  # stale generation
    os.makedirs(base, exist_ok=True)
    if not os.path.exists(marker):
        with open(marker, "w") as fh:
            fh.write(str(GEN_VERSION))
    for name in TABLES:
        target = os.path.join(base, name)
        if os.path.isdir(target) and any(
            f.endswith(".parquet") for f in os.listdir(target)
        ):
            continue
        staging = f"{target}.staging-{uuid.uuid4().hex[:8]}"
        gen_table(spark, name).coalesce(4).write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, target)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # another runner won
    return base


#: view-name prefix: the driver's testdata `customer` view would otherwise
#: shadow (or be shadowed by) the TPC-DS customer table in a shared session
PREFIX = "tpcds_"


def register_tpcds(spark: SparkSession, base: str | None = None) -> str:
    """Materialize (once) + register every table as a `tpcds_<name>` temp
    view — the `tpcds.sfN.*` schema surface of the reference connector,
    backed by write-once parquet. Idempotent and cached per session."""
    if getattr(spark, "_tpcds_registered", None):
        return spark._tpcds_registered
    base = ensure_materialized(spark, base)
    for name in TABLES:
        spark.read.parquet(os.path.join(base, name)).createOrReplaceTempView(f"{PREFIX}{name}")
    spark._tpcds_registered = base
    return base


def qualify(sql: str) -> str:
    """Rewrite bare TPC-DS table names in query text to the registered
    `tpcds_<name>` views (longest-first, word-boundary — `customer` inside
    `customer_address` is untouched because `_` is a word character).
    String literals are skipped: q93's `r_reason_desc = 'reason 28'`
    must not become `'tpcds_reason 28'`."""
    import re

    def _rw(chunk: str) -> str:
        for name in sorted(TABLES, key=len, reverse=True):
            chunk = re.sub(rf"\b{name}\b", f"{PREFIX}{name}", chunk)
        return chunk

    parts = re.split(r"('(?:[^']|'')*')", sql)
    return "".join(p if p.startswith("'") else _rw(p) for p in parts)


def oracle_prelude() -> str:
    """CTE list aliasing every `tpcds_<name>` to read_parquet over the
    materialized files — prepended to each vendored query so DuckDB sees
    the exact same data Spark does."""
    base = warehouse_dir()
    return ", ".join(
        f"{PREFIX}{name} AS (SELECT * FROM read_parquet('{os.path.join(base, name)}/*.parquet'))"
        for name in TABLES
    )
