"""Pure-Python XXH64 — an INDEPENDENT implementation of the public xxHash
specification (https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md),
used only by the oracle layer to cross-check Spark's ``xxhash64`` expression.

Spark's ``xxhash64(c1, c2, ...)`` (catalyst XxHash64, seed 42) folds the
arguments left-to-right: ``h = XXH64(encode(c_i), seed=h_prev)`` starting at
seed 42, where ``encode`` is the little-endian fixed-width encoding for
int/long and the raw UTF-8 bytes for strings. Spark's specialized
``hashInt``/``hashLong`` shortcuts are algebraically identical to XXH64 of
the 4-/8-byte little-endian encoding (the 4-byte and 8-byte tail branches of
the spec), so one generic byte-oriented implementation covers everything.
Results are returned as SIGNED 64-bit ints to match Spark's LongType.
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


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    u &= _M
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Replicate Spark's ``F.xxhash64(...)`` (signed long result).

    Each arg is ``(value, kind)`` with kind in {"string", "int", "long"};
    a bare ``str`` means ("string",), a bare ``int`` means ("int",) — the
    type PySpark infers for a small ``F.lit``.
    """
    h = seed
    for a in args:
        if isinstance(a, tuple):
            value, kind = a
        elif isinstance(a, str):
            value, kind = a, "string"
        elif isinstance(a, int):
            value, kind = a, "int"
        else:
            raise TypeError(f"unsupported arg {a!r}")
        if kind == "string":
            data = value.encode("utf-8")
        elif kind == "int":
            data = struct.pack("<i", value)
        elif kind == "long":
            data = struct.pack("<q", value)
        else:
            raise ValueError(f"unknown kind {kind!r}")
        h = xxh64(data, h)
    return _signed(h)


__all__ = ["xxh64", "spark_xxhash64"]
