"""64-bit node identifiers via XXH64, matching Spark's ``xxhash64``.

Cayley dictionary-encodes every value to an opaque Ref before execution
(reference: graph/refs/refs.go:47-58 ``HashOf`` — there a SHA1 prefix; the
*contract* is only "stable content hash of the canonical value form").
We use XXH64(seed=42) over the UTF-8 canonical string because that is
exactly what Spark's built-in ``F.xxhash64(col)`` computes JVM-side —
so node ids can be produced at scale inside whole-stage codegen with no
Python involvement, while the driver can still constant-fold literal
lookups (``g.V("<bob>")``) into plain ``col('s') == lit(h)`` predicates
that push down to the Parquet scan.

This file is a from-scratch implementation of the public XXH64 algorithm
(Yann Collet, BSD) specialised to seed=42; verified against Spark's
``xxhash64`` in tests/test_hashing.py.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SEED = 42  # Spark's XxHash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK64


def xxh64(data: bytes, seed: int = SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        limit = n - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while idx + 8 <= n:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        idx += 8
    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        idx += 4
    while idx < n:
        h ^= (data[idx] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        idx += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def to_signed(h: int) -> int:
    """Map unsigned 64-bit to Java signed long (what Spark returns)."""
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_str(s: str) -> int:
    """Signed-64 hash of a canonical string — equals ``F.xxhash64(lit(s))``."""
    return to_signed(xxh64(s.encode("utf-8")))
