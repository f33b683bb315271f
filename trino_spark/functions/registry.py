"""SQL-surface registration for functions that need a Python scalar body.

Most of the Trino scalar library maps to Spark builtins (same name) or to
dialect rewrites (dialect/rewrites.py templates — those stay inside
whole-stage codegen). The residue registered here is the set of scalars
with no reasonable expression form: Unicode normalization, Porter
stemming, base32/HMAC codecs, and the statistical CDF family
(reference: StringFunctions.java normalize, WordStemFunction.java,
VarbinaryFunctions.java:41, HmacFunctions.java, MathFunctions.java CDFs).

These are row-at-a-time Python UDFs by design: they are formatting /
analysis scalars, not hot-path columnar work. The Column-API variants in
functions/crypto.py (Arrow pandas_udfs) and functions/stats.py (pure
expressions) remain the fast path; this module only makes the names
resolvable from `engine.sql` text, the way the reference registers them
in its SystemFunctionBundle (main/metadata/SystemFunctionBundle.java:389).

CDF numerics: regularized incomplete beta/gamma via the standard
continued-fraction / series algorithms (Lentz's method), double
precision, pure stdlib `math`.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import math
import unicodedata

from pyspark.sql import SparkSession

_MAXIT = 300
_EPS = 3e-14
_FPMIN = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        c = 1.0 + aa / c
        d = _FPMIN if abs(d) < _FPMIN else d
        c = _FPMIN if abs(c) < _FPMIN else c
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        c = 1.0 + aa / c
        d = _FPMIN if abs(d) < _FPMIN else d
        c = _FPMIN if abs(c) < _FPMIN else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b) + a * math.log(x) + b * math.log1p(-x)
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x <= 0.0:
        return 0.0
    if x < a + 1.0:  # series representation
        ap, total, delta = a, 1.0 / a, 1.0 / a
        for _ in range(_MAXIT):
            ap += 1.0
            delta *= x / ap
            total += delta
            if abs(delta) < abs(total) * _EPS:
                break
        return total * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q, P = 1 - Q
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAXIT + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = _FPMIN if abs(d) < _FPMIN else d
        c = b + an / c
        c = _FPMIN if abs(c) < _FPMIN else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1.0 - q


# ---------------------------------------------------------------- scalars


def _norm(form: str):
    return lambda s: None if s is None else unicodedata.normalize(form, s)


def _hmac_fn(algo: str):
    def run(data, key):
        if data is None or key is None:
            return None
        return _hmac.new(bytes(key), bytes(data), getattr(hashlib, algo)).digest()

    return run


def _beta_cdf(a, b, x):
    if None in (a, b, x):
        return None
    return betainc(float(a), float(b), float(x))


def _binomial_cdf(successes, trials, p):
    if None in (successes, trials, p):
        return None
    k, n = int(successes), int(trials)
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    return betainc(n - k, k + 1, 1.0 - float(p))


def _poisson_cdf(lam, k):
    if None in (lam, k):
        return None
    if k < 0:
        return 0.0
    return 1.0 - gammainc_p(k + 1.0, float(lam))


def _chi_squared_cdf(df, x):
    if None in (df, x):
        return None
    return gammainc_p(float(df) / 2.0, float(x) / 2.0)


def _gamma_cdf(shape, scale, x):
    if None in (shape, scale, x):
        return None
    return gammainc_p(float(shape), float(x) / float(scale))


def _t_cdf(df, x):
    if None in (df, x):
        return None
    df, x = float(df), float(x)
    p = 0.5 * betainc(df / 2.0, 0.5, df / (df + x * x))
    return 1.0 - p if x > 0 else p


def _f_cdf(d1, d2, x):
    if None in (d1, d2, x):
        return None
    d1, d2, x = float(d1), float(d2), float(x)
    if x <= 0:
        return 0.0
    return betainc(d1 / 2.0, d2 / 2.0, d1 * x / (d1 * x + d2))


def _laplace_cdf(mean, scale, x):
    if None in (mean, scale, x):
        return None
    z = (float(x) - float(mean)) / float(scale)
    return 0.5 * math.exp(z) if z < 0 else 1.0 - 0.5 * math.exp(-z)


def _weibull_cdf(a, b, x):
    if None in (a, b, x):
        return None
    if x <= 0:
        return 0.0
    return 1.0 - math.exp(-((float(x) / float(b)) ** float(a)))


def _normal_cdf(mean, sd, x):
    if None in (mean, sd, x):
        return None
    return 0.5 * (1.0 + math.erf((float(x) - float(mean)) / (float(sd) * math.sqrt(2.0))))


def _inverse_normal_cdf(mean, sd, p):
    if None in (mean, sd, p):
        return None
    p = float(p)
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    # Newton refinement over erf starting from the rational approximation.
    lo, hi = -40.0, 40.0
    z = 0.0
    for _ in range(200):
        z = (lo + hi) / 2.0
        if 0.5 * (1.0 + math.erf(z / math.sqrt(2.0))) < p:
            lo = z
        else:
            hi = z
        if hi - lo < 1e-13:
            break
    return float(mean) + float(sd) * z


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotently register the Python-bodied scalar residue so Trino SQL
    text referencing them resolves through `engine.sql`."""
    from trino_spark.functions.stem import porter_stem

    reg = spark.udf.register
    reg("normalize", _norm("NFC"), "string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        reg(f"normalize_{form.lower()}", _norm(form), "string")
    reg("word_stem", lambda w: None if w is None else porter_stem(w), "string")
    reg("to_base32", lambda b: None if b is None else base64.b32encode(bytes(b)).decode(), "string")
    reg(
        "from_base32",
        lambda s: None if s is None else base64.b32decode(s.upper() + "=" * (-len(s) % 8)),
        "binary",
    )
    for algo in ("md5", "sha1", "sha256", "sha512"):
        reg(f"hmac_{algo}", _hmac_fn(algo), "binary")
    # spooky_hash_v2_* deliberately NOT registered: no faithful
    # implementation available here and substituting another hash under
    # that name would silently produce wrong (non-portable) digests.
    reg("beta_cdf", _beta_cdf, "double")
    reg("binomial_cdf", _binomial_cdf, "double")
    reg("poisson_cdf", _poisson_cdf, "double")
    reg("chi_squared_cdf", _chi_squared_cdf, "double")
    reg("gamma_cdf", _gamma_cdf, "double")
    reg("t_cdf", _t_cdf, "double")
    reg("f_cdf", _f_cdf, "double")
    reg("laplace_cdf", _laplace_cdf, "double")
    reg("weibull_cdf", _weibull_cdf, "double")
    reg("normal_cdf", _normal_cdf, "double")
    reg("inverse_normal_cdf", _inverse_normal_cdf, "double")
    reg("cauchy_cdf", lambda m, s, x: None if None in (m, s, x) else 0.5 + math.atan((float(x) - float(m)) / float(s)) / math.pi, "double")
    reg(
        "human_readable_seconds",
        _human_readable_seconds,
        "string",
    )
    # Returns bigint milliseconds (the Column API's parse_duration
    # contract; Trino returns interval day-to-second, same information).
    reg("parse_duration", _parse_duration_ms, "bigint")


def _human_readable_seconds(v):
    if v is None:
        return None
    total = int(abs(float(v)) + 0.5)
    parts = []
    for unit, word in ((604800, "week"), (86400, "day"), (3600, "hour"), (60, "minute"), (1, "second")):
        n, total = divmod(total, unit)
        if n:
            parts.append(f"{n} {word}" + ("" if n == 1 else "s"))
    return ", ".join(parts) if parts else "0 seconds"


_DUR_MS = {
    "ns": 1e-6, "us": 1e-3, "ms": 1.0, "s": 1000.0,
    "m": 60_000.0, "h": 3_600_000.0, "d": 86_400_000.0,
}


def _parse_duration_ms(s):
    import re as _re

    if s is None:
        return None
    m = _re.match(r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", s)
    if not m or m.group(2) not in _DUR_MS:
        raise ValueError(f"invalid duration: {s}")
    return round(float(m.group(1)) * _DUR_MS[m.group(2)])
