"""SpookyHash V2 — pure-Python implementation of Bob Jenkins' public-
domain algorithm (burtleburtle.net/bob/hash/spooky.html), backing the
reference's spooky_hash_v2_32 / spooky_hash_v2_64
(core/trino-main/.../scalar/VarbinaryFunctions.java via airlift
SpookyHashV2; expected digests pinned from
TestVarbinaryFunctions.java:783-797).

Verification status: the SHORT path (messages < 192 bytes — every test
vector the reference publishes, and the practical domain of SQL string
hashing) matches the reference's pinned digests exactly. The LONG path
(>= 192 bytes, the 12-lane Mix/End rounds): the reference's own suite
pins NO >= 192 B vector (TestVarbinaryFunctions.java:786-796 — all
inputs <= 5 bytes) and no second implementation is reachable offline,
so round 6 verifies it by a DIFFERENT-SHAPED transcription: the
published spooky.cpp Mix/EndPartial statement lists, copied verbatim
into tests/test_text_crypto.py, agree with this module's
modular-index-loop form across the long domain (block boundaries,
partial tails, multiple seeds), and three long digests are pinned as
regression vectors. That rules out loop-refactoring transcription
errors; a byte-for-byte external vector remains impossible to obtain
in this container and is documented rather than assumed.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_SC = 0xDEADBEEFDEADBEEF


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _M


def _short_mix(h: list) -> None:
    for i, k in ((2, 50), (3, 52), (0, 30), (1, 41), (2, 54), (3, 48),
                 (0, 38), (1, 37), (2, 62), (3, 34), (0, 5), (1, 36)):
        h[i] = _rot(h[i], k)
        h[i] = (h[i] + h[(i + 1) % 4]) & _M
        h[(i + 2) % 4] ^= h[i]


def _short_end(h: list) -> None:
    for i, k in ((2, 15), (3, 52), (0, 26), (1, 51), (2, 28), (3, 9),
                 (0, 47), (1, 54), (2, 32), (3, 25), (0, 63)):
        h[(i + 1) % 4] ^= h[i]
        h[i] = _rot(h[i], k)
        h[(i + 1) % 4] = (h[(i + 1) % 4] + h[i]) & _M


def _short(data: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    length = len(data)
    h = [seed1, seed2, _SC, _SC]
    pos = 0
    if length > 15:
        while length - pos >= 32:
            u = struct.unpack_from("<4Q", data, pos)
            h[2] = (h[2] + u[0]) & _M
            h[3] = (h[3] + u[1]) & _M
            _short_mix(h)
            h[0] = (h[0] + u[2]) & _M
            h[1] = (h[1] + u[3]) & _M
            pos += 32
        if length - pos >= 16:
            u = struct.unpack_from("<2Q", data, pos)
            h[2] = (h[2] + u[0]) & _M
            h[3] = (h[3] + u[1]) & _M
            _short_mix(h)
            pos += 16
    rem = data[pos:]
    r = len(rem)
    h[3] = (h[3] + (length << 56)) & _M
    if r == 0:
        h[2] = (h[2] + _SC) & _M
        h[3] = (h[3] + _SC) & _M
    elif r >= 8:
        h[2] = (h[2] + struct.unpack("<Q", rem[:8])[0]) & _M
        d_add = 0
        for i, by in enumerate(rem[8:]):
            d_add |= by << (8 * i)
        h[3] = (h[3] + d_add) & _M
    else:
        c_add = 0
        for i, by in enumerate(rem):
            c_add |= by << (8 * i)
        h[2] = (h[2] + c_add) & _M
    _short_end(h)
    return h[0], h[1]


_MIX_ROT = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
_END_ROT = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)


def _mix(u: tuple, s: list) -> None:
    for i in range(12):
        s[i] = (s[i] + u[i]) & _M
        s[(i + 2) % 12] ^= s[(i + 10) % 12]
        s[(i + 11) % 12] ^= s[i]
        s[i] = _rot(s[i], _MIX_ROT[i])
        s[(i + 11) % 12] = (s[(i + 11) % 12] + s[(i + 1) % 12]) & _M


def _end_partial(h: list) -> None:
    for i in range(12):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _M
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rot(h[(i + 1) % 12], _END_ROT[i])


def _long(data: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    # published layout: h0=h3=h6=h9=seed1, h1=h4=h7=h10=seed2, rest sc
    h = [seed1, seed2, _SC] * 4
    pos = 0
    end = (len(data) // 96) * 96
    while pos < end:
        _mix(struct.unpack_from("<12Q", data, pos), h)
        pos += 96
    remainder = len(data) - pos
    buf = bytearray(96)
    buf[:remainder] = data[pos:]
    buf[95] = remainder
    u = struct.unpack("<12Q", bytes(buf))
    for i in range(12):
        h[i] = (h[i] + u[i]) & _M
    _end_partial(h)
    _end_partial(h)
    _end_partial(h)
    return h[0], h[1]


def hash128(data: bytes, seed1: int = 0, seed2: int = 0) -> tuple[int, int]:
    if len(data) < 192:
        return _short(data, seed1, seed2)
    return _long(data, seed1, seed2)


def hash64(data: bytes, seed: int = 0) -> int:
    return hash128(data, seed, seed)[0]


def hash32(data: bytes, seed: int = 0) -> int:
    return hash128(data, seed, seed)[0] & 0xFFFFFFFF
