"""Bloom-filter referential membership — the SCALE path for foreign-key
checks when the dimension's raw key set is too large to broadcast (SURVEY.md
§2.3 J4 referential anti-join at 100 TB; reference analog: the membership
gate of /root/reference/gan.py's known-drift filtering, SURVEY §2.1 S7).

At 10^8 dimension keys the exact broadcast anti-join ships ~800 MB of raw
keys to every executor; a Bloom filter at 1% false-positive rate ships
~120 MB of BITS and answers membership with zero shuffle on the fact side.
The trade is one-sided and safe for violation REPORTING: a Bloom filter has
NO false negatives, so every row it flags as missing is a DEFINITE
violation; a small deterministic fraction of true violations hash into
occupied bits and are missed (fp_missed — bounded by fill_ratio^k).

Spark-first shape (no UDF anywhere, no per-row Python):
- build: dimension keys fan out to k = n_hashes bit positions
  (pmod(xxhash64(key, lit(i)), n_bits) — pure JVM, bit-exactly replicated
  by operators/xxh64_replica for the DuckDB oracle), fold to words with ONE
  partial+final bit_or aggregate whose output is bounded by n_bits/64 rows
  REGARDLESS of dimension size, collect the word list (the filter itself —
  exactly what must reach the driver to be broadcast), and ship it as a
  one-row broadcast frame (never a plan literal: a broadcast moves once
  via the block manager, a literal would bloat every task binary).
- probe: each fact row cross-joins the one-row filter (broadcast
  nested-loop of a single row) and tests its k bits with element_at +
  shiftright — a single narrow projection, NO shuffle, NO explode on the
  fact side.

Everything is deterministic given the data, so q_bloom_referential carries
a FULL DuckDB oracle (the key->positions mapping embedded as literals; the
oracle rebuilds the filter and reproduces n_bloom_missing exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position_exprs(key: str, n_bits: int, n_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def build_bloom(
    dim: DataFrame, key: str, n_bits: int = 1 << 20, n_hashes: int = 5
) -> list[int]:
    """Driver-side word list (n_bits/64 signed longs) of the filter over the
    dimension's non-null keys. One aggregate pass: positions fan out k per
    key, partial bit_or collapses them map-side, so the shuffle AND the
    collect are bounded by n_bits/64 rows — the filter's own size — however
    many dimension rows exist. Duplicate positions need no distinct;
    bit_or is idempotent."""
    if n_bits % 64 or n_bits < 64:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    words = (
        dim.filter(F.col(key).isNotNull())
        .select(
            F.explode(F.array(*_position_exprs(key, n_bits, n_hashes))).alias("p")
        )
        .select(
            F.expr("p div 64").alias("wi"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("bit"),
        )
        .groupBy("wi")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    arr = [0] * (n_bits // 64)
    for r in words:
        arr[int(r["wi"])] = int(r["word"])
    return arr


def bloom_member(
    key: str, bf_col: str, n_bits: int, n_hashes: int
) -> Column:
    """Boolean membership test of `key` against the word-array column
    `bf_col`: all k bits set. Pure JVM (element_at + shiftright + bitwise
    and inside one whole-stage-codegen projection)."""
    tests = []
    for i in range(n_hashes):
        p = f"pmod(xxhash64({key}, {i}), {n_bits})"
        tests.append(
            f"(shiftright(element_at({bf_col}, cast({p} div 64 as int) + 1), "
            f"cast({p} % 64 as int)) & 1) = 1"
        )
    return F.expr(" AND ".join(tests))


def with_bloom_member(
    fact: DataFrame,
    words: list[int],
    key: str,
    n_bits: int,
    n_hashes: int,
    out_col: str = "bloom_member",
) -> DataFrame:
    """Fact frame + membership column: the one-row filter frame broadcasts
    once, every fact partition probes it locally — zero fact-side shuffle.
    NULL keys are not members (SQL IN semantics for the violation report:
    a null FK is a completeness problem, reported by the not_null check,
    not a referential one — they probe false here and callers filter)."""
    spark = fact.sparkSession
    bf = spark.createDataFrame([(words,)], "_bf array<bigint>")
    return (
        fact.crossJoin(F.broadcast(bf))
        .withColumn(
            out_col,
            F.col(key).isNotNull() & bloom_member(key, "_bf", n_bits, n_hashes),
        )
        .drop("_bf")
    )


def bloom_referential_counts(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    window_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Per-window referential report with BOTH paths side by side:
    n_bloom_missing (the scale path — definite violations, zero fact-side
    shuffle beyond the count) and n_exact_missing (the broadcast anti-join
    twin — the verification side a production run on an over-broadcast
    dimension would SKIP; health.referential_drift owns the exact-only
    surface). fp_missed = exact - bloom >= 0 is the deterministic count of
    true violations hidden by hash collisions; n_bloom_missing <=
    n_exact_missing ALWAYS (no false negatives) — pinned in
    tests/test_bloom.py. Null fact keys are excluded from n_checked on both
    paths (SQL IN semantics). Output: (window_col, n_checked,
    n_exact_missing, n_bloom_missing, fp_missed)."""
    words = build_bloom(dim, dim_key, n_bits=n_bits, n_hashes=n_hashes)
    f = fact.filter(F.col(fact_key).isNotNull())
    probed = with_bloom_member(
        f.select(window_col, fact_key), words, fact_key, n_bits, n_hashes
    )
    bloom = probed.groupBy(window_col).agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum((~F.col("bloom_member")).cast("long")).alias("n_bloom_missing"),
    )
    keys = dim.select(F.col(dim_key).alias(fact_key)).filter(
        F.col(fact_key).isNotNull()
    ).distinct()
    exact = (
        f.select(window_col, fact_key)
        .join(F.broadcast(keys), fact_key, "left_anti")
        .groupBy(window_col)
        .agg(F.count(F.lit(1)).alias("n_exact_missing"))
    )
    return (
        bloom.join(exact, window_col, "left")
        .select(
            window_col,
            "n_checked",
            F.coalesce("n_exact_missing", F.lit(0)).alias("n_exact_missing"),
            "n_bloom_missing",
            (
                F.coalesce("n_exact_missing", F.lit(0)) - F.col("n_bloom_missing")
            ).alias("fp_missed"),
        )
    )
