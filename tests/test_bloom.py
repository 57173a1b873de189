"""Bloom referential membership (functions/bloom): the no-false-negative
invariant (the property that makes the scale path safe for violation
reporting), forced collisions at a deliberately undersized filter, null-key
semantics, and the bounded-build contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark.functions.bloom import (
    bloom_referential_counts,
    build_bloom,
    with_bloom_member,
)


def _frames(spark, n_fact=4000, n_dim=500, drop_mod=5):
    dim = spark.range(n_dim).select((F.col("id") * 3 + 1).alias("k")).filter(
        F.col("k") % drop_mod != 0
    )
    fact = spark.range(n_fact).select(
        (F.col("id") % 4).alias("w"),
        ((F.col("id") * 7919) % (n_dim * 3)).alias("k"),
    )
    return fact, dim


def test_no_false_negatives_row_level(spark):
    """Every key present in the dimension probes TRUE — a member's k bits
    were all set by its own insertion; bloom can only err in the other
    direction. Checked row-by-row, not just in aggregate, at a filter small
    enough (512 bits / 400 keys) that collisions are everywhere."""
    _, dim = _frames(spark)
    words = build_bloom(dim, "k", n_bits=512, n_hashes=4)
    probed = with_bloom_member(dim, words, "k", 512, 4)
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_forced_collisions_and_invariant(spark):
    """At 256 bits the filter saturates: fp_missed must be strictly
    positive somewhere (the scale path is honestly approximate), and
    n_bloom_missing <= n_exact_missing everywhere with the difference
    exactly fp_missed."""
    fact, dim = _frames(spark)
    rows = bloom_referential_counts(
        fact, dim, "k", "k", "w", n_bits=256, n_hashes=3
    ).collect()
    assert len(rows) == 4
    assert all(r["n_bloom_missing"] <= r["n_exact_missing"] for r in rows)
    assert all(
        r["fp_missed"] == r["n_exact_missing"] - r["n_bloom_missing"] for r in rows
    )
    assert any(r["fp_missed"] > 0 for r in rows)
    # and at a production-shaped size the same data yields near-exact counts
    big = bloom_referential_counts(
        fact, dim, "k", "k", "w", n_bits=1 << 15, n_hashes=5
    ).collect()
    assert all(r["n_exact_missing"] > 0 for r in big)
    assert sum(r["fp_missed"] for r in big) <= 0.01 * sum(
        r["n_exact_missing"] for r in big
    )


def test_null_keys_excluded(spark):
    """NULL fact keys are a completeness problem, not a referential one:
    excluded from n_checked and from both missing counts (SQL IN
    semantics)."""
    fact, dim = _frames(spark, n_fact=1000)
    fact = fact.withColumn(
        "k", F.when(F.col("k") % 11 == 0, None).otherwise(F.col("k"))
    )
    n_nonnull = fact.filter(F.col("k").isNotNull()).count()
    rows = bloom_referential_counts(
        fact, dim, "k", "k", "w", n_bits=4096, n_hashes=4
    ).collect()
    assert sum(r["n_checked"] for r in rows) == n_nonnull


def test_build_is_bounded_and_validates(spark):
    """The build's collect is bounded by n_bits/64 words however large the
    dimension, and bad geometry is rejected loudly."""
    _, dim = _frames(spark, n_dim=5000)
    words = build_bloom(dim, "k", n_bits=1024, n_hashes=6)
    assert len(words) == 1024 // 64
    with pytest.raises(ValueError):
        build_bloom(dim, "k", n_bits=100)
    with pytest.raises(ValueError):
        build_bloom(dim, "k", n_bits=256, n_hashes=0)
