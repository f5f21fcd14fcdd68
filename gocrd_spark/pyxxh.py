"""Pure-Python xxHash64 matching Spark's ``F.xxhash64``.

Implements the public XXH64 algorithm (Collet, github.com/Cyan4973/xxHash)
with the same per-type framing Spark's Catalyst ``XxHash64`` expression
uses (org.apache.spark.sql.catalyst.expressions.XXH64):

- string  -> XXH64 over the UTF-8 bytes;
- int     -> ``hashInt`` (4-byte framing, value zero-extended);
- long    -> ``hashLong`` (8-byte framing);
- multiple arguments fold left with the running hash as the next seed,
  starting from Spark's default seed 42.

Purpose: the driver-oracle golden generators (tools/gen_goldens.py) must
recompute MinHash/SimHash/winnowing outputs WITHOUT calling the Spark
operators — this module is the independent hash kernel those pure-Python
twins build on. Parity with the JVM implementation is pinned by
tests/test_pyxxh.py over randomized inputs of every framing.
"""

from __future__ import annotations

PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) & _MASK
    h ^= h >> 29
    h = (h * PRIME64_3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME64_2) & _MASK
    return (_rotl(acc, 31) * PRIME64_1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * PRIME64_1 + PRIME64_4) & _MASK


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Canonical XXH64 over a byte string (unsigned 64-bit result)."""
    length = len(data)
    seed &= _MASK
    i = 0
    if length >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & _MASK
        v2 = (seed + PRIME64_2) & _MASK
        v3 = seed
        v4 = (seed - PRIME64_1) & _MASK
        while i <= length - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME64_5) & _MASK
    h = (h + length) & _MASK
    while i <= length - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * PRIME64_1 + PRIME64_4) & _MASK
        i += 8
    if i <= length - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME64_1) & _MASK
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & _MASK
        i += 4
    while i < length:
        h ^= (data[i] * PRIME64_5) & _MASK
        h = (_rotl(h, 11) * PRIME64_1) & _MASK
        i += 1
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: 4-byte framing, value zero-extended."""
    h = (seed + PRIME64_5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * PRIME64_1) & _MASK
    h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & _MASK
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: 8-byte framing."""
    h = (seed + PRIME64_5 + 8) & _MASK
    k1 = (_rotl((value & _MASK) * PRIME64_2 & _MASK, 31) * PRIME64_1) & _MASK
    h = (_rotl(h ^ k1, 27) * PRIME64_1 + PRIME64_4) & _MASK
    return _fmix(h)


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64(*values, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Fold like Spark's ``F.xxhash64(*cols)``: running hash seeds the
    next value's hash. Values map to Spark literal/column types the way
    PySpark infers them:

    - ``str``            -> StringType (UTF-8 bytes)
    - ``int`` in int32   -> IntegerType (``F.lit`` of a small Python int)
    - ``int`` otherwise  -> LongType
    - ``('long', int)``  -> force LongType framing (column of longs)

    Returns the SIGNED 64-bit value Spark emits.
    """
    h = seed & _MASK
    for v in values:
        if isinstance(v, tuple) and v[0] == "long":
            h = hash_long(v[1], h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = hash_int(v, h)
            else:
                h = hash_long(v, h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(v)}")
    return _to_signed(h)
