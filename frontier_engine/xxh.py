"""Pure-Python XXH64 matching Spark's built-in ``F.xxhash64`` (seed 42).

Spark's ``xxhash64`` expression hashes a string column's UTF-8 bytes with the
standard XXH64 algorithm at seed 42 (org.apache.spark.sql.catalyst.expressions
XxHash64 / sql/catalyst XXH64.java — public Apache Spark source). We need the
same 64-bit keys driver-side so the golden refspec scheduler (refspec.py) can
reproduce the exact URL-seen membership and crawl ordering that the Spark
pipeline computes with the JVM built-in. Parity is pinned by
tests/test_spark_parity.py.

The reference engine has no hashing at all — its work keys are sqlite ROWIDs
(container-crawler Crawler.submit_items modulo-shards on row['ROWID']); the
64-bit xxhash key is the north-star generalization of that row identity.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 over ``data``; returns the unsigned 64-bit digest."""
    length = len(data)
    pos = 0

    if length >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        limit = length - 32
        while pos <= limit:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK

    h = (h + length) & _MASK

    while pos + 8 <= length:
        h ^= _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        pos += 8
    if pos + 4 <= length:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        pos += 4
    while pos < length:
        h ^= (data[pos] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        pos += 1

    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark-compatible signed 64-bit hash of a string (== F.xxhash64(col))."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_bucket(s: str, buckets: int) -> int:
    """Spark-compatible ``pmod(xxhash64(s), buckets)``.

    Python's ``%`` on a positive modulus already returns a non-negative
    result for negative operands, which is exactly Spark's ``pmod``.
    """
    return xxhash64_str(s) % buckets
