"""IPv4 address functions — Trino's IPADDRESS type and function family,
emulated over StringType dotted-quad columns with pure JVM expressions.

Reference: core/trino-spi/.../type/StandardTypes.java:48-49 (IPADDRESS) and
core/trino-main/.../scalar/IpAddressFunctions.java:31 (ip_prefix,
ip_subnet_min, ip_subnet_max, ip_subnet_range, is_private). Trino stores
both v4 and v6 as 128-bit; we cover the v4 subset as bigint arithmetic —
every function is an expression composition (codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ipv4_to_long(addr: Column | str) -> Column:
    """'a.b.c.d' -> 32-bit value as bigint."""
    p = F.split(_c(addr), r"\.")
    return (
        p[0].cast("long") * F.lit(16777216)
        + p[1].cast("long") * F.lit(65536)
        + p[2].cast("long") * F.lit(256)
        + p[3].cast("long")
    )


def long_to_ipv4(n: Column | str) -> Column:
    """bigint -> dotted quad."""
    v = _c(n)
    return F.concat_ws(
        ".",
        F.floor(v / 16777216) % 256,
        F.floor(v / 65536) % 256,
        F.floor(v / 256) % 256,
        v % 256,
    )


def _network(addr: Column | str, bits: Column | int) -> Column:
    """Network (lowest) address of addr/bits as a bigint."""
    b = F.lit(bits) if isinstance(bits, int) else _c(bits)
    block = F.pow(F.lit(2.0), F.lit(32) - b).cast("long")
    return (F.floor(ipv4_to_long(addr) / block) * block).cast("long")


def ip_prefix(addr: Column | str, bits: Column | int) -> Column:
    """Canonical CIDR of the containing subnet: ip_prefix('1.2.3.4', 24) ->
    '1.2.3.0/24' (IpAddressFunctions.java ip_prefix)."""
    b = F.lit(bits) if isinstance(bits, int) else _c(bits)
    return F.concat(long_to_ipv4(_network(addr, bits)), F.lit("/"), b.cast("string"))


def ip_subnet_min(addr: Column | str, bits: Column | int) -> Column:
    """Lowest address of the subnet containing addr."""
    return long_to_ipv4(_network(addr, bits))


def ip_subnet_max(addr: Column | str, bits: Column | int) -> Column:
    """Highest address of the subnet containing addr."""
    b = F.lit(bits) if isinstance(bits, int) else _c(bits)
    block = F.pow(F.lit(2.0), F.lit(32) - b).cast("long")
    return long_to_ipv4(_network(addr, bits) + block - 1)


def is_private_ip(addr: Column | str) -> Column:
    """RFC1918/loopback/link-local membership (IpAddressFunctions is_private)."""
    v = ipv4_to_long(addr)
    def _in(cidr_base: str, bits: int) -> Column:
        base = sum(
            int(o) * m for o, m in zip(cidr_base.split("."), (16777216, 65536, 256, 1))
        )
        block = 1 << (32 - bits)
        return (v >= F.lit(base)) & (v < F.lit(base + block))

    return (
        _in("10.0.0.0", 8)
        | _in("172.16.0.0", 12)
        | _in("192.168.0.0", 16)
        | _in("127.0.0.0", 8)
        | _in("169.254.0.0", 16)
    )
