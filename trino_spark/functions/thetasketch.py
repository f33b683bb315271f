"""Apache DataSketches Theta sketch binary interop —
theta_sketch_cardinality / theta_sketch_union
(docs/functions/datasketches.md; plugin `datasketches` connector).

Implements the PUBLIC compact Theta serialization layout (serial
version 3, family 3) documented by the Apache DataSketches project:

  byte 0      preamble longs (1 empty/single-item, 2 exact, 3 estimation)
  byte 1      serial version (3)
  byte 2      family id (3 = COMPACT)
  byte 3      lgNomLongs   byte 4  lgArrLongs
  byte 5      flags (0x01 big-endian, 0x02 read-only, 0x04 empty,
                     0x08 compact, 0x10 ordered, 0x20 single-item)
  bytes 6-7   seed hash (low 16 bits of murmur3(seed-as-le-long, 0))
  bytes 8-11  retained-entry count (preLongs >= 2)
  bytes 16-23 thetaLong (preLongs == 3; else Long.MAX_VALUE)
  then        retained hash longs (ordered ascending when ORDERED)

Item hashing matches the library: murmur3-x64-128 of the item bytes
with the sketch seed (default 9001), first long logically
unsigned-shifted right by one. Estimate = count * LONG_MAX / thetaLong.
The union keeps the minimum theta, merges entry sets, and lowers theta
to the (k+1)-th smallest hash when retained exceeds the nominal k —
the standard Theta "bottom-k over a hash permutation" argument, so
sketches built here and sketches built by the library merge correctly.

Verification: no DataSketches library exists in this container, so the
tests pin (a) byte-level layout invariants of every emitted mode
against the published preamble table, (b) exact-mode estimates equal
true counts, (c) estimation-mode error within the published 1/sqrt(k)
bounds, and (d) union/intersection identities. Cross-library byte
round-trip is asserted structurally (parse(serialize(x)) == x for all
modes) rather than against library-produced binaries.
"""

from __future__ import annotations

import struct

DEFAULT_SEED = 9001
DEFAULT_LGK = 12  # nominal 4096 entries, the library default
_LONG_MAX = (1 << 63) - 1
_F_READONLY, _F_EMPTY, _F_COMPACT, _F_ORDERED, _F_SINGLE = 0x02, 0x04, 0x08, 0x10, 0x20


def seed_hash(seed: int = DEFAULT_SEED) -> int:
    from trino_spark.functions.registry import murmur3_x64_128

    h = murmur3_x64_128(struct.pack("<q", seed), seed=0)
    sh = int.from_bytes(h[:8], "little") & 0xFFFF
    if sh == 0:
        raise ValueError("seed produced a zero seed-hash; choose another seed")
    return sh


def hash_item(value, seed: int = DEFAULT_SEED) -> int:
    """Library-compatible item hash: murmur3 first long >>> 1.

    Canonical byte forms follow the DataSketches update API: longs for
    integral values, the IEEE double bits for floats, UTF-8 for
    strings, raw bytes otherwise."""
    from trino_spark.functions.registry import murmur3_x64_128

    if isinstance(value, bytes):
        data = value
    elif isinstance(value, bool):
        data = struct.pack("<q", int(value))
    elif isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, float):
        data = struct.pack("<q", struct.unpack("<q", struct.pack("<d", value))[0])
    else:
        data = str(value).encode("utf-8")
    h = murmur3_x64_128(data, seed=seed)
    return int.from_bytes(h[:8], "little") >> 1  # unsigned >>> 1


def parse(b: bytes, seed: int | None = None) -> tuple[int, list, int]:
    """-> (thetaLong, sorted entry list, seed_hash). Accepts compact
    (family 3) sketches in empty / single-item / exact / estimation
    modes; validates the seed hash when `seed` is supplied."""
    b = bytes(b)
    if len(b) < 8:
        raise ValueError("theta sketch too short")
    pre = b[0] & 0x3F
    ser = b[1]
    fam = b[2]
    if ser != 3:
        raise ValueError(f"unsupported theta sketch serial version {ser}")
    if fam != 3:
        raise ValueError(f"unsupported sketch family {fam} (compact theta only)")
    flags = b[5]
    sh = struct.unpack_from("<H", b, 6)[0]
    if seed is not None and sh != seed_hash(seed):
        raise ValueError("sketch seed hash does not match the supplied seed")
    if flags & _F_EMPTY:
        return _LONG_MAX, [], sh
    if pre == 1:  # single-item sketch
        if len(b) < 16:
            raise ValueError("single-item theta sketch too short")
        return _LONG_MAX, [struct.unpack_from("<q", b, 8)[0]], sh
    count = struct.unpack_from("<I", b, 8)[0]
    theta = _LONG_MAX
    off = 8 * pre
    if pre >= 3:
        theta = struct.unpack_from("<q", b, 16)[0]
    entries = list(struct.unpack_from(f"<{count}q", b, off)) if count else []
    entries.sort()
    return theta, entries, sh


def serialize(theta: int, entries: list, sh: int) -> bytes:
    entries = sorted(entries)
    base_flags = _F_READONLY | _F_COMPACT | _F_ORDERED
    if not entries and theta >= _LONG_MAX:
        return bytes([1, 3, 3, DEFAULT_LGK, 5, base_flags | _F_EMPTY]) + struct.pack(
            "<H", sh
        )
    if len(entries) == 1 and theta >= _LONG_MAX:
        return bytes([1, 3, 3, DEFAULT_LGK, 5, base_flags | _F_SINGLE]) + struct.pack(
            "<Hq", sh, entries[0]
        )
    if theta >= _LONG_MAX:
        head = bytes([2, 3, 3, DEFAULT_LGK, 5, base_flags]) + struct.pack(
            "<HI", sh, len(entries)
        ) + b"\x00" * 4
    else:
        head = (
            bytes([3, 3, 3, DEFAULT_LGK, 5, base_flags])
            + struct.pack("<HI", sh, len(entries))
            + b"\x00" * 4
            + struct.pack("<q", theta)
        )
    return head + struct.pack(f"<{len(entries)}q", *entries)


def estimate(b: bytes, seed: int | None = None) -> float:
    theta, entries, _ = parse(b, seed)
    if not entries:
        return 0.0
    return len(entries) * (_LONG_MAX / theta)


def union(sketches, nominal_entries: int = 1 << DEFAULT_LGK, seed: int | None = None) -> bytes:
    """Merge serialized sketches: min theta, merged entry set, theta
    lowered to the (k+1)-th smallest hash past the nominal k."""
    theta = _LONG_MAX
    merged: set = set()
    sh = None
    for b in sketches:
        if b is None:
            continue
        t, entries, s = parse(b, seed)
        if sh is None:
            sh = s
        elif s != sh:
            raise ValueError("cannot union theta sketches with different seeds")
        theta = min(theta, t)
        merged.update(entries)
    if sh is None:
        sh = seed_hash(seed if seed is not None else DEFAULT_SEED)
    entries = sorted(e for e in merged if e < theta)
    k = int(nominal_entries)
    if len(entries) > k:
        theta = entries[k]
        entries = entries[:k]
    return serialize(theta, entries, sh)


def build(values, nominal_entries: int = 1 << DEFAULT_LGK, seed: int = DEFAULT_SEED) -> bytes:
    """Engine extension (the reference does not create sketches): build
    a compact ordered theta sketch from raw values, interoperable with
    the readers above and with the library layout."""
    hashes = sorted({hash_item(v, seed) for v in values if v is not None} - {0})
    theta = _LONG_MAX
    k = int(nominal_entries)
    if len(hashes) > k:
        theta = hashes[k]
        hashes = hashes[:k]
    return serialize(theta, hashes, seed_hash(seed))
