"""Pure-Python XXH64 (public-domain algorithm, Yann Collet) matching
Spark's ``F.xxhash64`` semantics (seed 42, and the specialized int/long
paths Spark's XxHash64 expression uses for numeric children).

Used ONLY by the single-process golden oracle (oracle_docops.py) so that
MinHash/SimHash/hyperplane-LSH goldens are computed independently of any
Spark plan while agreeing bit-for-bit with the JVM ``xxhash64`` values.
Unit-tested against ``F.xxhash64`` in tests/test_toolbox.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """Spark XXH64.hashInt: one 4-byte lane (value treated as unsigned32)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int = SPARK_SEED) -> int:
    """Spark XXH64.hashLong: one 8-byte lane."""
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 over a byte buffer (Spark hashes UTF8String bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k1 = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(x: int) -> int:
    """uint64 -> int64 (Spark's xxhash64 returns a signed long)."""
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Equivalent of ``F.xxhash64(string_col)`` (signed 64-bit result)."""
    return _signed(hash_bytes(s.encode("utf-8"), seed & _M))


def xxhash64_str_int(s: str, i: int) -> int:
    """Equivalent of ``F.xxhash64(string_col, F.lit(i))`` for a small int
    literal: the string hash becomes the seed of the int lane."""
    h = hash_bytes(s.encode("utf-8"), SPARK_SEED)
    return _signed(hash_int(i, h))


def xxhash64_int(i: int) -> int:
    """Equivalent of ``F.xxhash64(F.lit(i))`` for an int literal."""
    return _signed(hash_int(i, SPARK_SEED))


def xxhash64_long(i: int) -> int:
    """Equivalent of ``F.xxhash64(long_col)`` (LongType lane, 8 bytes)."""
    return _signed(hash_long(i, SPARK_SEED))
