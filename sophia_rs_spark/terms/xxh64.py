"""Pure-Python XXH64 (the public xxHash 64-bit algorithm).

Used for deterministic blank-node skolemization and term ids.  With
``seed=42`` this matches Spark's ``F.xxhash64`` over a single STRING/BINARY
column, so ids computed Python-side (inside parser UDFs) and JVM-side
(``F.xxhash64``) agree — replacing sophia's sequential ``BasicTermIndex``
counter (`inmem/src/index.rs:355-368`) and per-parse UUIDv7 bnode freshening
(`turtle/src/parser/_common/_inner.rs:23-36`), both of which are inherently
serial and non-reproducible across runs.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

# Spark's XxHash64 expression uses seed 42 (org.apache.spark.sql.catalyst
# .expressions.XxHash64 default seed).
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` with the given seed, as an unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 as a signed 64-bit int — the value Spark's ``F.xxhash64`` returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def skolem_label(url: str, label: str) -> str:
    """Deterministic skolemized blank-node label, scoped to a document url.

    Replaces sophia's per-parse UUIDv7 suffixing
    (`turtle/src/parser/_common/_inner.rs:23-36`): the same (url, label)
    always maps to the same 64-bit label regardless of run, partition
    layout, or cluster size — the property the north rule's
    reproducibility-at-two-cluster-sizes criterion requires.
    """
    h = xxh64(url.encode("utf-8") + b"\x00" + label.encode("utf-8"))
    return f"h{h:016x}"
