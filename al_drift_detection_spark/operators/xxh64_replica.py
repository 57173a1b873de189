"""Bit-exact numpy replica of Spark's `xxhash64(...)` expression for the
long/int column shapes the engine uses.

Purpose: train_ivf_centroids selects its driver sample with
`ORDER BY xxhash64(vec_id, lit(seed)) LIMIT n` — a deterministic,
ingestion-order-free pick. The q_ivf_topk DuckDB oracle must reproduce the
SAME sample (and therefore the same trained centroids) WITHOUT a Spark
session, so this module re-implements the xxHash64 one-word paths exactly
as Spark's XXH64 does (same primes, same per-column seed chaining from 42,
same int-vs-long block handling; the algorithm is the public xxHash
specification as instantiated by Spark's `xxhash64` SQL function).
Parity with the JVM implementation is pinned in
tests/test_ivf_oracle.py::test_xxhash64_replica_matches_spark.

All arithmetic is numpy uint64 (wrapping); results reinterpret to signed
int64 — the value Spark's expression returns and orders by.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_U64 = np.uint64


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def _hash_long(value: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """XXH64.hashLong: one 8-byte block (LongType column)."""
    h = seed + _P5 + _U64(8)
    h = h ^ (_rotl(value * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def _hash_int(value: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """XXH64.hashInt: one 4-byte block (IntegerType column/literal)."""
    h = seed + _P5 + _U64(4)
    h = h ^ ((value & _U64(0xFFFFFFFF)) * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def xxhash64_long(longs: np.ndarray, seed: int = 42) -> np.ndarray:
    """Spark `xxhash64(long_col)` (single column, default seed 42): the
    KMV overlap sketches order by this value (functions/kmv.py) and their
    lazy DuckDB oracle embeds it. Parity pinned in tests/test_kmv.py."""
    with np.errstate(over="ignore"):
        v = np.asarray(longs, dtype=np.int64).view(np.uint64)
        h = _hash_long(v, _U64(seed))
    return h.view(np.int64)


def xxhash64_long_int(longs: np.ndarray, int_lit: int, seed: int = 42) -> np.ndarray:
    """Spark `xxhash64(long_col, lit(int))` (seed chains column-wise from
    42, the expression default): returns signed int64 — the sort key of
    train_ivf_centroids' sample pick."""
    with np.errstate(over="ignore"):
        v = np.asarray(longs, dtype=np.int64).view(np.uint64)
        h = _hash_long(v, _U64(seed))
        h = _hash_int(_U64(int_lit & 0xFFFFFFFF), h)
    return h.view(np.int64)
