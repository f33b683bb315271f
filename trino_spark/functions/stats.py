"""Statistical scalar functions — Trino's CDF / interval family.

Reference: core/trino-main/.../scalar/MathFunctions.java:79 (cauchy_cdf,
uniform_cdf, normal_cdf, inverse_normal_cdf, ...) and WilsonInterval.java:1
(wilson_interval_lower/upper). Everything here is an expression composition
(codegen, no UDFs):

- wilson/cauchy/uniform are exact closed forms;
- normal_cdf uses the Abramowitz & Stegun 7.1.26 erf polynomial
  (|error| < 1.5e-7 — sufficient for analytics; documented vs Trino's
  exact libm erf);
- inverse_normal_cdf uses the Beasley-Springer-Moro rational approximation
  (|error| ~ 1e-9 over (0,1) center, 1e-6 tails).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def wilson_interval_lower(successes: Column | str, trials: Column | str, z: float) -> Column:
    return _wilson(_c(successes), _c(trials), z, -1.0)


def wilson_interval_upper(successes: Column | str, trials: Column | str, z: float) -> Column:
    return _wilson(_c(successes), _c(trials), z, 1.0)


def _wilson(s: Column, n: Column, z: float, sign: float) -> Column:
    p = s / n
    z2 = z * z
    center = p + F.lit(z2) / (2 * n)
    spread = F.lit(z) * F.sqrt(p * (1 - p) / n + F.lit(z2) / (4 * n * n))
    return (center + F.lit(sign) * spread) / (1 + F.lit(z2) / n)


def cauchy_cdf(median: Column | float, scale: Column | float, x: Column | str) -> Column:
    m = F.lit(median) if isinstance(median, (int, float)) else _c(median)
    s = F.lit(scale) if isinstance(scale, (int, float)) else _c(scale)
    return 0.5 + F.atan((_c(x) - m) / s) / math.pi


def uniform_cdf(lo: Column | float, hi: Column | float, x: Column | str) -> Column:
    a = F.lit(lo) if isinstance(lo, (int, float)) else _c(lo)
    b = F.lit(hi) if isinstance(hi, (int, float)) else _c(hi)
    return F.least(F.greatest((_c(x) - a) / (b - a), F.lit(0.0)), F.lit(1.0))


def erf(x: Column) -> Column:
    """A&S 7.1.26 polynomial erf (|err| < 1.5e-7), odd-extended."""
    z = F.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = (
        t
        * (
            0.254829592
            + t
            * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
        )
    )
    pos = 1.0 - poly * F.exp(-z * z)
    return F.when(x >= 0, pos).otherwise(-pos)


def normal_cdf(mean: Column | float, sd: Column | float, x: Column | str) -> Column:
    m = F.lit(mean) if isinstance(mean, (int, float)) else _c(mean)
    s = F.lit(sd) if isinstance(sd, (int, float)) else _c(sd)
    return 0.5 * (1.0 + erf((_c(x) - m) / (s * math.sqrt(2.0))))


def inverse_normal_cdf(mean: Column | float, sd: Column | float, p: Column | str) -> Column:
    """Beasley-Springer-Moro rational approximation of probit(p)."""
    m = F.lit(mean) if isinstance(mean, (int, float)) else _c(mean)
    s = F.lit(sd) if isinstance(sd, (int, float)) else _c(sd)
    pc = _c(p)
    a = [
        -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
        1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00,
    ]
    b = [
        -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
        6.680131188771972e01, -1.328068155288572e01,
    ]
    c = [
        -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
        -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00,
    ]
    d = [
        7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
        3.754408661907416e00,
    ]
    plow, phigh = 0.02425, 1 - 0.02425

    def _center(q: Column) -> Column:
        r = q * q
        num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
        den = (((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]
        return num * q / (den * r + 1.0)

    def _tail(q: Column) -> Column:  # q = sqrt(-2 ln p_tail)
        num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        den = ((d[0] * q + d[1]) * q + d[2]) * q + d[3]
        return num / (den * q + 1.0)

    lo_q = F.sqrt(-2.0 * F.log(pc))
    hi_q = F.sqrt(-2.0 * F.log(1.0 - pc))
    z = (
        F.when(pc < plow, _tail(lo_q))
        .when(pc > phigh, -_tail(hi_q))
        .otherwise(_center(pc - 0.5))
    )
    return m + s * z


def great_circle_distance(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Haversine distance in km (Trino MathFunctions.java:79
    great_circle_distance — same mean-Earth radius 6371.01 km)."""
    rlat1, rlon1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    rlat2, rlon2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    dlat = (rlat2 - rlat1) / 2
    dlon = (rlon2 - rlon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return 2 * 6371.01 * F.asin(F.sqrt(a))
