"""Pure-Python XXH64 — an implementation of the public xxHash64
algorithm (Cyan4973/xxHash spec), written for tools/crosscheck_goldens.py
so the frozen seeded-hash goldens can be recomputed WITHOUT Spark.
Spark's ``xxhash64(...)`` is standard XXH64 with seed 42, chained over the
arguments (each argument's hash becomes the seed of the next): strings
hash their UTF-8 bytes, longs hash as the 8-byte little-endian value
(Spark's specialized ``hashLong`` equals XXH64 over those 8 bytes).

Self-validated against Spark in crosscheck_goldens.py before use.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned 64-bit XXH64 of ``data`` with ``seed``."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = _round(v1, l1), _round(v2, l2), _round(v3, l3), _round(v4, l4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


class I32:
    """Marks an argument as a Spark IntegerType (4-byte) value — what a
    plain Python ``F.lit(3)`` produces; Spark hashes it as 4 LE bytes,
    not 8."""

    __slots__ = ("v",)

    def __init__(self, v: int):
        self.v = v


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(*args)`` (signed long): chain the per-argument
    hashes, each becoming the next argument's seed. Supported argument
    types: str (UTF-8 bytes), int (LongType: 8-byte LE two's complement),
    I32 (IntegerType: 4-byte LE)."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, I32):
            h = xxh64(struct.pack("<i", ((a.v + (1 << 31)) % (1 << 32)) - (1 << 31)), h)
        elif isinstance(a, int):
            h = xxh64(struct.pack("<q", ((a + (1 << 63)) % (1 << 64)) - (1 << 63)), h)
        else:
            raise TypeError(f"unsupported type {type(a)}")
    return _signed(h)
