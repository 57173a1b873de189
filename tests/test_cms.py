"""Count-min sketch (functions/cms): the bit-exact xxhash64 bucket parity
the lazy DuckDB oracle rests on, the one-sided guarantee (est >= true for
EVERY key, not just the oracle's candidates), the merge = one-shot identity
that makes the sketch a snapshot-store tenant, and the persisted store's
incremental + replay + compaction contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from al_drift_detection_spark.functions.cms import (
    cms_cells,
    cms_point_estimates,
    compact_cms_store,
    store_cms_estimates,
    update_cms_store,
)

D, W = 3, 64


def _events(spark, n=8_000, windows=4, card=150):
    # zipf-ish: key = floor(sqrt(id mod card^2 / card)) concentrates mass on
    # low keys so real heavy hitters + a long tail both exist
    return spark.range(n).select(
        (F.col("id") % windows).alias("w"),
        (F.floor(F.sqrt((F.col("id") * 48271) % (card * card))) % card).alias("k"),
    )


def test_bucket_parity_with_replica(spark):
    """pmod(xxhash64(key, lit(r)), width) in the JVM == the numpy replica
    for every hash row the sketch uses — the exact premise of the lazy
    oracle's embedded mapping literals."""
    from al_drift_detection_spark.operators.xxh64_replica import xxhash64_long_int

    keys = np.array([0, 1, 7, 149, 2**40, -3], dtype=np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    for r in range(5):
        got = [
            row["b"]
            for row in df.select(
                "k", F.pmod(F.xxhash64("k", F.lit(r)), F.lit(W)).alias("b")
            )
            .orderBy("k")
            .collect()
        ]
        want = [int(h % W) for h in xxhash64_long_int(np.sort(keys), r)]
        assert got == want, (r, got, want)


def test_one_sided_guarantee_all_keys(spark):
    """est >= exact for EVERY (window, key) — every occurrence incremented
    every one of the key's cells, so the min can never undercount — and at
    150 keys in 64 buckets collisions make some overcount strictly positive
    (the estimate is approximate, not secretly exact)."""
    df = _events(spark)
    cells = cms_cells(df, "k", "w", depth=D, width=W)
    all_keys = df.select("k").distinct()
    est = cms_point_estimates(cells, all_keys, "k", "w", depth=D, width=W)
    exact = df.groupBy("w", "k").agg(F.count(F.lit(1)).alias("n"))
    j = est.join(exact, ["w", "k"], "left").select(
        "w", "k", "est", F.coalesce("n", F.lit(0)).alias("n")
    ).collect()
    assert len(j) == 4 * 150
    assert all(r["est"] >= r["n"] for r in j)
    assert any(r["est"] > r["n"] for r in j)
    # absent (window, key) combinations estimate >= 0 and appear in the grid
    assert all(r["est"] >= 0 for r in j)


def test_merge_equals_one_shot(spark):
    """cells(A) + cells(B) summed == cells(A ∪ B): the linearity that makes
    incremental snapshots and compaction lossless."""
    df = _events(spark)
    a, b = df.filter(F.col("k") % 2 == 0), df.filter(F.col("k") % 2 == 1)
    merged = (
        cms_cells(a, "k", "w", depth=D, width=W)
        .unionByName(cms_cells(b, "k", "w", depth=D, width=W))
        .groupBy("w", "r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    one = cms_cells(df, "k", "w", depth=D, width=W)
    assert merged.exceptAll(one).count() == 0
    assert one.exceptAll(merged).count() == 0


def test_store_incremental_replay_compaction(spark, tmp_path):
    """Two ingests answer like one big batch; replaying an ingest under its
    snapshot id is a no-op; compaction leaves every estimate identical and
    the store bounded to one snapshot unit."""
    store = str(tmp_path / "cms_store")
    df = _events(spark)
    day1, day2 = df.filter(F.col("w") < 2), df.filter(F.col("w") >= 2)
    update_cms_store(day1, store, "k", "w", snapshot_id=0, depth=D, width=W)
    update_cms_store(day2, store, "k", "w", snapshot_id=1, depth=D, width=W)
    keys = df.select("k").distinct().limit(20)

    def answers():
        return {
            (r["w"], r["k"]): r["est"]
            for r in store_cms_estimates(
                spark, store, keys, "k", "w", depth=D, width=W
            ).collect()
        }

    base = answers()
    one_shot = {
        (r["w"], r["k"]): r["est"]
        for r in cms_point_estimates(
            cms_cells(df, "k", "w", depth=D, width=W), keys, "k", "w",
            depth=D, width=W,
        ).collect()
    }
    assert base == one_shot
    # replay: same snapshot id dynamic-overwrites its own rows
    update_cms_store(day2, store, "k", "w", snapshot_id=1, depth=D, width=W)
    assert answers() == base
    # compaction: answers identical, live snapshots folded away
    assert compact_cms_store(spark, store, "w", keep_last=0) == 1
    assert answers() == base


def test_point_estimates_single_execution(spark):
    """The cells pipeline feeding cms_point_estimates executes ONCE per
    call (VERDICT r7 "What's wrong" #1: the window-list grid used to fold
    from the raw `cells` argument, re-running the whole raw scan +
    posexplode + aggregate a second time). Pinned with an accumulator on
    the source: rows seen == n exactly, not 2n."""
    import pandas as pd

    from al_drift_detection_spark.functions._persist import release

    n = 4_000
    acc = spark.sparkContext.accumulator(0)

    def counted(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pd.DataFrame({"w": pdf["id"] % 4, "k": pdf["id"] % 150})

    src = spark.range(n).mapInPandas(counted, "w long, k long")
    cells = cms_cells(src, "k", "w", depth=D, width=W)
    keys = spark.createDataFrame([(3,), (17,)], "k long")
    est = cms_point_estimates(cells, keys, "k", "w", depth=D, width=W)
    assert est.count() == 4 * 2  # windows x probe keys
    assert acc.value == n, (
        f"cells pipeline ran {acc.value / n:.1f}x — must execute exactly once"
    )
    release(est)
