"""Datetime parity (reference: main/operator/scalar/DateTimeFunctions.java:72,
751 LoC). Two pieces Spark lacks:

1. Trino's unit-string API: date_add('day', 3, x), date_diff('hour', a, b),
   date_trunc('week', x) — Spark spells these differently per unit.
2. Trino's MySQL-style format patterns (%Y-%m-%d) for date_format/date_parse —
   Spark uses java.time patterns; `mysql_to_java()` translates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "millisecond": 0.001,
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def date_add(unit: str, value: int, ts: Column | str) -> Column:
    """Trino date_add(unit, value, timestamp)."""
    unit = unit.lower()
    c = _c(ts)
    if unit in ("year", "quarter", "month"):
        months = {"year": 12, "quarter": 3, "month": 1}[unit] * value
        return F.timestamp_add("MONTH", F.lit(months), c)
    return F.timestamp_add(unit.upper(), F.lit(value), c)


def date_diff(unit: str, start: Column | str, end: Column | str) -> Column:
    """Trino date_diff(unit, start, end) -> bigint (end - start)."""
    unit = unit.lower()
    s, e = _c(start), _c(end)
    if unit in ("year", "quarter", "month"):
        months = F.floor(F.months_between(e, s))
        div = {"year": 12, "quarter": 3, "month": 1}[unit]
        return (months / div).cast("long")
    secs = F.unix_timestamp(e) - F.unix_timestamp(s)
    return F.floor(secs / F.lit(_UNIT_SECONDS[unit])).cast("long")


def date_trunc(unit: str, ts: Column | str) -> Column:
    """Trino date_trunc(unit, ts) — Spark's date_trunc with unit mapping."""
    return F.date_trunc(unit.lower(), _c(ts))


# MySQL %-pattern -> java.time pattern (Trino's date_format dialect;
# DateTimeFunctions.java DateFormat). Longest-match table.
_MYSQL_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%M": "MMMM",
    "%b": "MMM",
    "%a": "EEE",
    "%W": "EEEE",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%%": "%",
}


def mysql_to_java(fmt: str) -> str:
    """Translate a Trino/MySQL date_format pattern to java.time."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(_MYSQL_TO_JAVA.get(tok, tok[1]))
            i += 2
        else:
            # literal chars that are pattern letters in java.time need quoting
            ch = fmt[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def format_datetime(ts: Column | str, mysql_fmt: str) -> Column:
    """Trino date_format(ts, '%Y-%m-%d') on Spark."""
    return F.date_format(_c(ts), mysql_to_java(mysql_fmt))


def parse_datetime(s: Column | str, mysql_fmt: str) -> Column:
    """Trino date_parse(string, '%Y-%m-%d')."""
    return F.to_timestamp(_c(s), mysql_to_java(mysql_fmt))
