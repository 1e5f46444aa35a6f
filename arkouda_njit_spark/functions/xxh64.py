"""Pure-Python replay of Spark's ``xxhash64`` SQL function.

Spark's ``xxhash64(c1, c2, ...)`` chains the public XXH64 algorithm (Yann
Collet's xxHash, public domain) over the column values with seed 42:
``h = 42; for c in cols: h = XXH64(c, seed=h)`` using the fixed-width
primitive paths (4-byte for int, 8-byte for long). The engine derives
deterministic pseudo-randomness from it everywhere (generators, LSH
hyperplanes), so a host-side replay lets cross-engine oracles (DuckDB)
verify those pipelines: data-independent constants (LSH plane components,
synthetic-generator draws) are computed here and inlined into the oracle
SQL as literals — an independent reimplementation, not a call back into
Spark.

Verified bit-exact against Spark in tests/test_entry.py
(test_xxh64_matches_spark).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte value (Spark IntegerType path)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte value (Spark LongType path)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*fields: tuple[str, int]) -> int:
    """Replay ``F.xxhash64(...)`` over int/long fields.

    ``fields`` are ``("int", v)`` or ``("long", v)`` in column order; the
    result is Spark's signed 64-bit output."""
    h = 42
    for kind, v in fields:
        if kind == "int":
            h = hash_int(v, h)
        elif kind == "long":
            h = hash_long(v, h)
        else:
            raise ValueError(f"unsupported field kind {kind!r}")
    return _signed(h)


TWO63 = float(2**63)


def u01(*fields: tuple[str, int]) -> float:
    """sources/pages.py's ``_u01``: xxhash64 mapped to [0, 1)."""
    return (spark_xxhash64(*fields) / TWO63 + 1.0) / 2.0
