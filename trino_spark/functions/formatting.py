"""Formatting/parsing scalars: parse_duration, human_readable_seconds,
format_number, parse_data_size, to_milliseconds.

Reference: DateTimeFunctions.java:732 (parse_duration via airlift Duration:
double value + unit in {ns,us,ms,s,m,h,d}, optional whitespace, -> millis),
timestamp/HumanReadableSeconds.java:35 (round |seconds|, decompose into
weeks/days/hours/minutes/seconds, pluralize, join with ", ", zero ->
"0 seconds"), FormatNumberFunction.java:60 (divide by 1000 up to five times
-> K/M/B/T/Q; 3 significant digits via #.## / #.# / # HALF_UP with trailing
zeros stripped), DataSizeFunctions.java:41 (leading [0-9.]+ value, exact
unit in {B,kB,MB,GB,TB,PB,EB,ZB,YB}, 1024^n factors, truncate to integer
bytes).

All pure Spark expressions — whole-stage codegen, no UDFs. Invalid inputs
yield NULL (Spark convention) instead of Trino's INVALID_FUNCTION_ARGUMENT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DURATION_MS = {
    "ns": 1e-6, "us": 1e-3, "ms": 1.0, "s": 1000.0,
    "m": 60_000.0, "h": 3_600_000.0, "d": 86_400_000.0,
}

_SIZE_FACTOR = {
    "B": 1, "kB": 1 << 10, "MB": 1 << 20, "GB": 1 << 30, "TB": 1 << 40,
    "PB": 1 << 50, "EB": 1 << 60, "ZB": (1 << 60) * (1 << 10),
    "YB": (1 << 60) * (1 << 20),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _unit_case(unit: Column, table: dict[str, float], as_type: str) -> Column:
    expr = F.lit(None).cast(as_type)
    for u, f in reversed(table.items()):
        expr = F.when(unit == u, F.lit(f).cast(as_type)).otherwise(expr)
    return expr


def parse_duration(col: Column | str) -> Column:
    """Duration string -> bigint milliseconds (Trino returns an interval
    day-to-second, which carries ms; airlift Duration rounds)."""
    s = F.trim(_c(col))
    num = F.regexp_extract(s, r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", 1)
    unit = F.regexp_extract(s, r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", 2)
    ms = num.cast("double") * _unit_case(unit, _DURATION_MS, "double")
    return F.round(ms).cast("long")


def to_milliseconds(interval: Column | str) -> Column:
    """INTERVAL DAY TO SECOND -> millis (DateTimeFunctions.java:745)."""
    return (_c(interval) / F.expr("INTERVAL 1 MILLISECOND")).cast("long")


def human_readable_seconds(col: Column | str) -> Column:
    """Seconds (double) -> 'N weeks, N days, N hours, N minutes, N seconds'
    with singular/plural and zero-components dropped; 0 -> '0 seconds'."""
    total = F.floor(F.abs(_c(col).cast("double")) + 0.5).cast("long")
    weeks = (total / 604800).cast("long")
    days = (total % 604800 / 86400).cast("long")
    hours = (total % 86400 / 3600).cast("long")
    minutes = (total % 3600 / 60).cast("long")
    seconds = total % 60

    def part(n: Column, word: str) -> Column:
        return F.when(
            n > 0,
            F.concat(n.cast("string"), F.lit(" " + word), F.when(n == 1, "").otherwise("s")),
        )

    joined = F.concat_ws(
        ", ",
        part(weeks, "week"), part(days, "day"), part(hours, "hour"),
        part(minutes, "minute"), part(seconds, "second"),
    )
    return F.when(joined == "", F.lit("0 seconds")).otherwise(joined)


def format_number(col: Column | str) -> Column:
    """Large number -> unit-suffixed 3-significant-digit string
    (FormatNumberFunction.java:60: /1000 loop -> K/M/B/T/Q, then #.## /
    #.# / # by magnitude, HALF_UP, trailing zeros stripped). Mirrors the
    reference quirk that negative fractionals always take the #.## branch
    (the `value < 10` checks are on the signed value)."""
    v = _c(col).cast("long")
    a = F.abs(v)
    p = (
        F.when(a < 1_000, 0)
        .when(a < 1_000_000, 1)
        .when(a < 1_000_000_000, 2)
        .when(a < 1_000_000_000_000, 3)
        .when(a < 1_000_000_000_000_000, 4)
        .otherwise(5)
    )
    unit = F.element_at(F.lit(["", "K", "M", "B", "T", "Q"]), p + 1)
    frac = v.cast("double") / F.pow(F.lit(1000.0), p.cast("double"))
    decimals = F.when(frac < 10, 2).when(frac < 100, 1).otherwise(0)
    # round half-up away from zero at `decimals`, then strip trailing zeros
    scale = F.pow(F.lit(10.0), decimals.cast("double"))
    rounded = F.signum(frac) * F.floor(F.abs(frac) * scale + 0.5) / scale
    s = F.format_number(rounded, 2)  # fixed 2 decimals, no grouping needed <1000
    s = F.regexp_replace(F.regexp_replace(s, ",", ""), r"\.?0+$", "")
    return F.concat(s, unit)


def parse_data_size(col: Column | str) -> Column:
    """Data-size string -> bytes as decimal(38,0). Exact for values whose
    byte count fits a double's 53-bit mantissa (through multi-PB); the
    reference's BigDecimal path is exact through YB — documented gap."""
    s = _c(col)
    num = F.regexp_extract(s, r"^([0-9.]+)(.*)$", 1)
    unit = F.regexp_extract(s, r"^([0-9.]+)(.*)$", 2)
    factor = _unit_case(unit, {k: float(v) for k, v in _SIZE_FACTOR.items()}, "double")
    return F.floor(num.cast("double") * factor).cast("decimal(38,0)")
