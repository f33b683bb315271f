"""TIME(p) emulation — Trino's time-of-day types over bigint nanos-of-day.

Reference: core/trino-spi/.../type/TimeType.java (TIME(p), p<=12, stored as
picos-of-day) and the scalar package core/trino-main/.../scalar/time/.
Spark has no time-of-day type (SURVEY.md §1.2 flags this as the mapping
gap); the documented policy is LongType nanoseconds-of-day plus these
helpers. Nanos (not picos) bounds the emulation at p=9 — beyond Spark's
own timestamp precision already.

All functions are expression compositions (codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NANOS_PER_SECOND = 1_000_000_000
NANOS_PER_MINUTE = 60 * NANOS_PER_SECOND
NANOS_PER_HOUR = 60 * NANOS_PER_MINUTE
NANOS_PER_DAY = 24 * NANOS_PER_HOUR


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_time(s: Column | str) -> Column:
    """'HH:MM:SS[.fraction]' -> nanos-of-day bigint (fraction up to 9
    digits, right-padded — TIME literal parsing per TimeType)."""
    c = _c(s)
    p = F.split(c, ":")
    sec_part = F.split(p[2], r"\.")
    frac = F.rpad(F.coalesce(sec_part[1], F.lit("")), 9, "0").cast("long")
    return (
        p[0].cast("long") * F.lit(NANOS_PER_HOUR)
        + p[1].cast("long") * F.lit(NANOS_PER_MINUTE)
        + sec_part[0].cast("long") * F.lit(NANOS_PER_SECOND)
        + frac
    )


def format_time(nanos: Column | str, precision: int = 3) -> Column:
    """nanos-of-day -> 'HH:MM:SS[.frac]' with exactly `precision` fraction
    digits (0 drops the point), mirroring TIME(p) output."""
    v = _c(nanos)
    hh = F.lpad((F.floor(v / NANOS_PER_HOUR)).cast("string"), 2, "0")
    mm = F.lpad((F.floor(v / NANOS_PER_MINUTE) % 60).cast("string"), 2, "0")
    ss = F.lpad((F.floor(v / NANOS_PER_SECOND) % 60).cast("string"), 2, "0")
    base = F.concat_ws(":", hh, mm, ss)
    if precision <= 0:
        return base
    frac = F.substring(
        F.lpad((v % NANOS_PER_SECOND).cast("string"), 9, "0"), 1, precision
    )
    return F.concat(base, F.lit("."), frac)


def time_hour(nanos: Column | str) -> Column:
    return F.floor(_c(nanos) / NANOS_PER_HOUR).cast("long")


def time_minute(nanos: Column | str) -> Column:
    return (F.floor(_c(nanos) / NANOS_PER_MINUTE) % 60).cast("long")


def time_second(nanos: Column | str) -> Column:
    return (F.floor(_c(nanos) / NANOS_PER_SECOND) % 60).cast("long")


def time_millisecond(nanos: Column | str) -> Column:
    return (F.floor(_c(nanos) / 1_000_000) % 1000).cast("long")


def time_add(nanos: Column | str, delta_nanos: Column | int) -> Column:
    """Add a (possibly negative) nano delta, wrapping around midnight —
    Trino's TIME arithmetic semantics (scalar/time/ interval ops)."""
    d = F.lit(delta_nanos) if isinstance(delta_nanos, int) else _c(delta_nanos)
    return F.pmod(_c(nanos) + d, F.lit(NANOS_PER_DAY)).cast("long")
