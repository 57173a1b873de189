"""KMV overlap sketches (functions/kmv): single-column xxhash64 replica
parity (the lazy oracle's premise), the exact-when-union-fits invariant,
estimator accuracy at real k, bounded sketch size, and null-key
semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark.functions.kmv import (
    exact_pair_overlap,
    kmv_pair_overlap,
    kmv_sketches,
)


def test_xxhash64_single_column_parity(spark):
    from al_drift_detection_spark.operators.xxh64_replica import xxhash64_long

    keys = np.array([0, 1, 7, 149, 1149, 2**40, -3], dtype=np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    got = [
        r["h"]
        for r in df.select("k", F.xxhash64("k").alias("h")).orderBy("k").collect()
    ]
    want = [int(h) for h in xxhash64_long(np.sort(keys))]
    assert got == want


def _churn_frame(spark, per_window=5000, windows=4, keep_share=0.7):
    """Window w's key population: ids in [w*drift, w*drift + per_window) —
    consecutive windows overlap by exactly (1 - drift/per_window)."""
    drift = int(per_window * (1 - keep_share))
    return spark.range(per_window * windows).select(
        (F.col("id") % windows).alias("w"),
        ((F.col("id") / windows).cast("long") + (F.col("id") % windows) * drift)
        .alias("key"),
    )


def test_exact_when_union_fits_k(spark):
    """If the union's distinct hashes all fit inside k, the coordinated
    sample IS the union and the estimate equals the exact Jaccard."""
    df = _churn_frame(spark, per_window=200, keep_share=0.5)
    est = kmv_pair_overlap(kmv_sketches(df, "key", "w", k=1024), "w", k=1024)
    ex = exact_pair_overlap(df, "key", "w")
    j = {r["w"]: r for r in est.join(ex.drop("w_next"), "w").collect()}
    assert len(j) == 3
    for r in j.values():
        assert r["jaccard_est"] == pytest.approx(r["jaccard_exact"], abs=1e-12)


def test_estimator_accuracy_at_real_k(spark):
    """5k keys per window, 70% retained, k=512: every pair's estimate lands
    within 4/sqrt(k) of the true Jaccard (~0.54)."""
    df = _churn_frame(spark)
    k = 512
    est = kmv_pair_overlap(kmv_sketches(df, "key", "w", k=k), "w", k=k)
    ex = exact_pair_overlap(df, "key", "w")
    rows = est.join(ex.drop("w_next"), "w").collect()
    assert len(rows) == 3
    tol = 4.0 / k**0.5
    for r in rows:
        assert abs(r["jaccard_est"] - r["jaccard_exact"]) <= tol, (
            r["w"], r["jaccard_est"], r["jaccard_exact"], tol,
        )


def test_sketch_bounded_and_nulls_excluded(spark):
    df = _churn_frame(spark).withColumn(
        "key", F.when(F.col("key") % 13 == 0, None).otherwise(F.col("key"))
    )
    sk = kmv_sketches(df, "key", "w", k=256)
    per_w = {r["w"]: r["n"] for r in sk.groupBy("w").agg(F.count("*").alias("n")).collect()}
    assert all(n == 256 for n in per_w.values())
    # a window of ONLY nulls contributes no sketch and no pair
    extra = spark.range(10).select(F.lit(9).alias("w"), F.lit(None).cast("long").alias("key"))
    sk2 = kmv_sketches(df.unionByName(extra), "key", "w", k=256)
    assert sk2.filter("w = 9").count() == 0
    with pytest.raises(ValueError):
        kmv_sketches(df, "key", "w", k=4)
