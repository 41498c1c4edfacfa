"""Pure-Python XXH64 for 8-byte longs, matching Spark's ``xxhash64``.

Spark's ``xxhash64(col)`` hashes each value's little-endian byte
representation with seed 42 (LongType → 8 bytes). Re-implementing the
public XXH64 algorithm driver-side lets the query planner compute a
term's bucket — and therefore which segment partitions to prune —
without launching a Spark job.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one little-endian int64 (Spark xxhash64 parity).

    Returns a SIGNED 64-bit int, as Spark does.
    """
    inp = value & _M  # two's-complement little-endian long
    h = (seed + _P5 + 8) & _M
    k1 = (inp * _P2) & _M
    k1 = _rotl(k1, 31)
    k1 = (k1 * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of_term(term_id: int, n_buckets: int) -> int:
    """pmod(xxhash64(term_id), n_buckets) — Spark F.pmod parity."""
    return xxhash64_long(term_id) % n_buckets
