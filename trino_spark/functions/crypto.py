"""Binary/crypto scalar gaps — HMAC family and base32 codecs.

Reference: main/operator/scalar/HmacFunctions.java:1 (hmac_md5, hmac_sha1,
hmac_sha256, hmac_sha512) and VarbinaryFunctions.java:41 (to_base32,
from_base32). Spark has no HMAC or base32 built-ins, so these are
Arrow-batched pandas UDFs (the sanctioned slow path — keyed hashing is
inherently per-row work; the batch transfer amortizes the Python cost).
md5/sha1/sha2/xxhash64/crc32/hex/base64 are Spark-native and not wrapped.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _hmac_udf(algo: str):
    @pandas_udf("binary")
    def run(data: pd.Series, key: pd.Series) -> pd.Series:
        def one(d, k):
            if d is None or k is None:
                return None
            return _hmac.new(bytes(k), bytes(d), getattr(hashlib, algo)).digest()

        return pd.Series([one(d, k) for d, k in zip(data, key)])

    return run


def hmac_md5(data: Column | str, key: Column | str) -> Column:
    return _hmac_udf("md5")(_c(data), _c(key))


def hmac_sha1(data: Column | str, key: Column | str) -> Column:
    return _hmac_udf("sha1")(_c(data), _c(key))


def hmac_sha256(data: Column | str, key: Column | str) -> Column:
    return _hmac_udf("sha256")(_c(data), _c(key))


def hmac_sha512(data: Column | str, key: Column | str) -> Column:
    return _hmac_udf("sha512")(_c(data), _c(key))


def to_base32(data: Column | str) -> Column:
    """VarbinaryFunctions.java to_base32 (RFC 4648, padded)."""

    @pandas_udf("string")
    def run(d: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else base64.b32encode(bytes(v)).decode("ascii") for v in d]
        )

    return run(_c(data))


def from_base32(data: Column | str) -> Column:
    """VarbinaryFunctions.java from_base32 (accepts unpadded input)."""

    @pandas_udf("binary")
    def run(d: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            pad = "=" * (-len(s) % 8)
            return base64.b32decode(s.upper() + pad)

        return pd.Series([one(s) for s in d])

    return run(_c(data))
