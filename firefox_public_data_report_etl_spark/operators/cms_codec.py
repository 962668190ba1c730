"""Pure-Python reader for Spark's serialized Count-Min sketch.

The SQL aggregate ``count_min_sketch(col, eps, confidence, seed)``
returns the byte serialization of
``org.apache.spark.util.sketch.CountMinSketchImpl`` — but PySpark 4.1
exposes no Python-side reader and no SQL estimate function, so
extracting per-item estimates previously required deserializing on
the driver through the private ``spark.sparkContext._jvm`` py4j
gateway: classic-mode only, broken under Spark Connect (r6/r7 review
item). This module decodes the bytes and evaluates string estimates
in Python instead — no JVM bridge, works identically under classic
and Connect, and the K-item estimate loop is driver-side either way.

Both layouts are public, stable wire/algorithm contracts of the
Spark sketch library (common/sketch):

serialization (``CountMinSketchImpl.writeTo``, DataOutputStream —
big-endian):

    int32   version          (1)
    int64   totalCount
    int32   depth
    int32   width
    int64[] hashA[depth]     (used only for long-typed items)
    int64[] table[depth][width]

string estimates (``CountMinSketchImpl.estimateCount`` →
``getHashBuckets``): UTF-8 bytes hashed with Spark's
``Murmur3_x86_32.hashUnsafeBytes`` (4-byte words read little-endian,
tail bytes mixed one SIGNED byte at a time — NOT the standard
murmur3 tail, which folds the tail into one word) twice —
``h1 = hash(b, seed=0)``, ``h2 = hash(b, seed=h1)`` — then bucket
``i`` is ``Math.abs((h1 + i*h2) % width)`` in Java int arithmetic,
and the estimate is the min of ``table[i][bucket_i]``.

The agreement between this decoder and the JVM writer is pinned two
ways: a unit test compares estimates against the JVM reader for the
same sketch bytes, and the ``token_heavy_hitters`` oracle binding's
``lower_ok`` boolean (estimate ≥ exact is a deterministic CMS
property) fails the value hash if the bucket math ever drifts.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_32_spark(data: bytes, seed: int) -> int:
    """Spark ``Murmur3_x86_32.hashUnsafeBytes`` over a byte array.
    Returns a SIGNED Java int. Differs from reference murmur3_x86_32
    in the tail: Spark mixes each remaining byte as its own
    sign-extended word instead of packing the tail into one word."""
    h1 = seed & _M32
    n4 = len(data) - len(data) % 4
    for i in range(0, n4, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(n4, len(data)):
        b = data[i]
        if b >= 128:  # Java bytes are signed; sign-extend to int
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _signed32(_fmix(h1, len(data)))


@dataclass(frozen=True)
class CountMinSketchBytes:
    """Decoded ``count_min_sketch`` aggregate result."""

    total_count: int
    depth: int
    width: int
    table: tuple[tuple[int, ...], ...]  # depth rows of width counters

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketchBytes":
        version, total, depth, width = struct.unpack_from(">iqii", data, 0)
        if version != 1:
            raise ValueError(
                f"unsupported CountMinSketch serialization version {version}"
            )
        off = 20 + 8 * depth  # skip hashA (long-item hashing only)
        n = depth * width
        flat = struct.unpack_from(f">{n}q", data, off)
        table = tuple(
            flat[d * width : (d + 1) * width] for d in range(depth)
        )
        return cls(total, depth, width, table)

    def estimate_string(self, item: str) -> int:
        b = item.encode("utf-8")
        h1 = murmur3_32_spark(b, 0)
        h2 = murmur3_32_spark(b, h1)
        est = None
        for i in range(self.depth):
            # Java: Math.abs((h1 + i*h2) % width) in 32-bit int math;
            # |rem| == |dividend| % width for a positive divisor
            bucket = abs(_signed32(h1 + i * h2)) % self.width
            v = self.table[i][bucket]
            est = v if est is None else min(est, v)
        return int(est)
