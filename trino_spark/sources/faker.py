"""Faker generator source: schema-driven deterministic synthetic rows.

The reference ships this as the `faker` connector (plugin/trino-faker):
declare a table schema, get plausible random rows on demand — used for
demos and load tests without real data. Spark-first equivalent: one
``spark.range(n)`` with a per-column pure-expression generator chosen by
(type, column-name hint), xxhash64-seeded so the same (schema, n, seed)
always yields identical data. Fully parallel, no files, no shuffle;
Catalyst prunes generators for unused columns.

Name hints (like the connector's generator properties): columns named
*email* get user@domain strings, *name* get First Last, *uuid*/*id* hex
identifiers, *ts*/*date*/*time* timestamps in 2020-2024.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FIRST = ["Ada", "Ben", "Chen", "Dara", "Eli", "Fay", "Gus", "Hana", "Ivo", "June"]
_LAST = ["Adams", "Berg", "Cole", "Diaz", "Egan", "Fox", "Gray", "Hale", "Iqbal", "Jones"]
_DOMAINS = ["example.com", "mail.test", "corp.example", "web.invalid"]
_WORDS = ["alpha", "bravo", "delta", "echo", "kilo", "lima", "nova", "oscar", "tango", "zulu"]


def _h(seed: int, name: str, extra: str = "") -> F.Column:
    return F.xxhash64(F.lit(f"{seed}:{name}:{extra}"), F.col("id"))


def _u(seed: int, name: str) -> F.Column:
    return (F.pmod(_h(seed, name), F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)).cast("double")


def _pick(seed: int, name: str, values: list[str], extra: str = "") -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(_h(seed, name, extra), F.lit(len(values))) + 1).cast("int"))


def _string_gen(name: str, seed: int) -> F.Column:
    low = name.lower()
    if "email" in low:
        return F.concat(
            F.lower(_pick(seed, name, _FIRST, "u")), F.lit("."),
            F.pmod(_h(seed, name, "n"), F.lit(1000)).cast("string"),
            F.lit("@"), _pick(seed, name, _DOMAINS, "d"),
        )
    if "name" in low:
        return F.concat(_pick(seed, name, _FIRST, "f"), F.lit(" "), _pick(seed, name, _LAST, "l"))
    if "uuid" in low or low.endswith("id"):
        return F.lower(F.hex(_h(seed, name)))
    return F.concat_ws(" ", _pick(seed, name, _WORDS, "w1"), _pick(seed, name, _WORDS, "w2"))


def _gen_for(field: T.StructField, seed: int) -> F.Column:
    dt, name = field.dataType, field.name
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
        return F.pmod(_h(seed, name), F.lit(1_000_000)).cast(dt)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return (_u(seed, name) * 1000.0).cast(dt)
    if isinstance(dt, T.DecimalType):
        return F.round(_u(seed, name) * 1000.0, dt.scale).cast(dt)
    if isinstance(dt, T.BooleanType):
        return (F.pmod(_h(seed, name), F.lit(2)) == 0).cast(dt)
    if isinstance(dt, T.DateType):
        return F.date_add(F.lit("2020-01-01").cast("date"), F.pmod(_h(seed, name), F.lit(1826)).cast("int"))
    if isinstance(dt, T.TimestampType):
        base = F.lit("2020-01-01 00:00:00").cast("timestamp")
        return F.timestamp_seconds(F.unix_timestamp(base) + F.pmod(_h(seed, name), F.lit(1826 * 86400)))
    if isinstance(dt, T.StringType):
        return _string_gen(name, seed)
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, (T.FloatType, T.DoubleType)):
        # embedding-like column: fixed 8-dim deterministic vector
        return F.array(*[(_u(seed, f"{name}[{i}]") * 2.0 - 1.0).cast(dt.elementType) for i in range(8)])
    raise ValueError(f"faker: unsupported type {dt.simpleString()} for column {name}")


def gen(spark: SparkSession, schema: str, n: int, seed: int = 0, parallelism: int | None = None) -> DataFrame:
    """Generate `n` deterministic rows for a Spark-DDL `schema` string."""
    struct = T.StructType.fromDDL(schema)
    rng = spark.range(0, n, 1, parallelism) if parallelism else spark.range(n)
    return rng.select(*[_gen_for(f, seed).alias(f.name) for f in struct.fields])
