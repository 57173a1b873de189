"""HLL sketch uniqueness (functions/sketches): estimate accuracy at real
cardinalities, the union-merge identity that makes cumulative/incremental
answers possible without re-reading data, and the persisted snapshot store's
incremental + idempotent-replay contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark.functions.sketches import (
    cumulative_uniqueness,
    exact_cumulative_distinct,
    store_uniqueness,
    update_hll_store,
    window_hll_sketches,
)


def _docs(spark, n=20_000, windows=10, card=5_000):
    # id space wraps at `card` so windows share ids — cumulative distinct
    # saturates and per-window/cumulative answers genuinely differ
    return spark.range(n).select(
        (F.col("id") % windows).alias("w"),
        F.concat(F.lit("u"), (F.col("id") * 2654435761 % card).cast("string")).alias(
            "uid"
        ),
    )


def test_per_window_estimates_within_rsd(spark):
    df = _docs(spark)
    sk = window_hll_sketches(df, "uid", "w", lgk=12)
    exact = df.groupBy("w").agg(F.countDistinct("uid").alias("ex"))
    joined = sk.join(exact, "w").collect()
    assert len(joined) == 10
    for r in joined:
        assert abs(r["est"] - r["ex"]) <= 0.05 * r["ex"], (r["w"], r["est"], r["ex"])


def test_union_merge_identity(spark):
    """sketch(A) ∪ sketch(B) must estimate EXACTLY what sketch(A ∪ B)
    estimates — HLL register state is order- and partition-insensitive, the
    property every cumulative/incremental answer here rests on."""
    df = _docs(spark)
    halves = window_hll_sketches(
        df.withColumn("half", (F.col("w") < 5).cast("int")), "uid", "half"
    )
    merged = halves.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).head()["est"]
    oneshot = (
        df.agg(F.hll_sketch_agg("uid", F.lit(12)).alias("s"))
        .select(F.hll_sketch_estimate("s").alias("est"))
        .head()["est"]
    )
    assert merged == oneshot


def test_cumulative_is_linear_running_union(spark):
    """cumulative_uniqueness must be the O(W) running union, never the
    W(W+1)/2 sketch-carrying prefix SELF-JOIN (VERDICT r6 "What's wrong"
    #2): the physical plan has NO join and exactly one Window (the
    growing-frame incremental fold), and the series length equals the
    window count — W sketch rows in, W rows out."""
    df = _docs(spark)
    est = cumulative_uniqueness(window_hll_sketches(df, "uid", "w"), "w")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan
    assert est.count() == 10


def test_cumulative_matches_exact_twin(spark):
    df = _docs(spark)
    est = cumulative_uniqueness(window_hll_sketches(df, "uid", "w"), "w")
    exact = exact_cumulative_distinct(df, "uid", "w")
    rows = exact.join(est, "w").orderBy("w").collect()
    assert len(rows) == 10
    last = None
    for r in rows:
        assert abs(r["est_cum"] - r["n_exact_cum"]) <= 0.05 * r["n_exact_cum"]
        if last is not None:  # both series are monotone non-decreasing
            assert r["n_exact_cum"] >= last
        last = r["n_exact_cum"]


def test_exact_cumulative_twin_is_exact(spark):
    df = _docs(spark, n=3_000, windows=6, card=800)
    got = {
        r["w"]: r["n_exact_cum"]
        for r in exact_cumulative_distinct(df, "uid", "w").collect()
    }
    for w in range(6):
        want = df.filter(F.col("w") <= w).select("uid").distinct().count()
        assert got[w] == want, w


def test_incremental_store_equals_one_shot(spark, tmp_path):
    """Two snapshot ingests (each sketching ONLY its own rows) must answer
    identically to a one-shot sketch over the full corpus — per window and
    corpus-wide — and replaying a snapshot must be a no-op (idempotent
    dynamic-partition overwrite)."""
    store = str(tmp_path / "hll_store")
    df = _docs(spark)
    snap1, snap2 = df.filter(F.col("w") < 5), df.filter(F.col("w") >= 5)
    update_hll_store(snap1, store, "uid", "w", snapshot_id=1)
    update_hll_store(snap2, store, "uid", "w", snapshot_id=2)

    total_row = (
        store_uniqueness(spark, store, "w").filter(F.col("w").isNull()).head()
    )
    oneshot = (
        df.agg(F.hll_sketch_agg("uid", F.lit(12)).alias("s"))
        .select(F.hll_sketch_estimate("s").alias("est"))
        .head()["est"]
    )
    assert total_row["est"] == oneshot
    assert total_row["n_rows"] == df.count()

    # replaying snapshot 2 (crash-retry) changes nothing
    update_hll_store(snap2, store, "uid", "w", snapshot_id=2)
    again = store_uniqueness(spark, store, "w").filter(F.col("w").isNull()).head()
    assert again["est"] == oneshot and again["n_rows"] == df.count()

    # per-window answers from the store match direct per-window sketches
    direct = {
        r["w"]: r["est"] for r in window_hll_sketches(df, "uid", "w").collect()
    }
    from_store = {
        r["w"]: r["est"]
        for r in store_uniqueness(spark, store, "w").filter(
            F.col("w").isNotNull()
        ).collect()
    }
    assert from_store == direct


def test_store_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        store_uniqueness(spark, str(tmp_path / "nope"), "w")


def test_null_keys_excluded_everywhere(spark):
    """NULL ids must not count as a distinct value (review finding): SQL
    count(DISTINCT) and hll_sketch_agg both ignore NULLs — the exact
    first-occurrence twin must too, or est-vs-exact (and the DuckDB oracle
    compare) diverge by exactly 1 from the first null-bearing window on."""
    df = spark.range(100).select(
        (F.col("id") % 4).alias("w"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 30).cast("string")))
        .alias("uid"),
    )
    got = {
        r["w"]: r["n_exact_cum"]
        for r in exact_cumulative_distinct(df, "uid", "w").collect()
    }
    for w in range(4):
        want = (
            df.filter((F.col("w") <= w) & F.col("uid").isNotNull())
            .select("uid")
            .distinct()
            .count()
        )
        assert got[w] == want, w
    # and the estimate agrees with the null-free exact count
    est = cumulative_uniqueness(window_hll_sketches(df, "uid", "w"), "w")
    rows = est.join(
        exact_cumulative_distinct(df, "uid", "w"), "w"
    ).collect()
    assert all(r["est_cum"] == r["n_exact_cum"] for r in rows)  # tiny card → exact


def test_hll_store_cli_incremental_and_idempotent(spark, tmp_path):
    """`runner --hll-store`: per-window + lifetime distinct counts answered
    from the persisted sketch store; re-running the SAME --run-id is a true
    no-op (snapshot overwrite), a new run-id re-sketching identical rows
    leaves every ESTIMATE unchanged (HLL registers are value-idempotent)
    while n_rows counts the doubled ingest."""
    from al_drift_detection_spark import runner

    out, store = str(tmp_path / "o1"), str(tmp_path / "hll")
    args = ["--images", "synthetic:6000", "--master", "local[8]",
            "--hll-store", store]
    assert runner.main(["--out", out, "--run-id", "r1", *args]) == 0
    first = spark.read.parquet(f"{out}/hll_uniqueness").toPandas()
    total = first[first.window_id.isnull()].iloc[0]
    assert total["n_rows"] == 6000
    # a handful of planted duplicate ids → estimate within the lgK=12 rsd
    # of the ~6000 true distinct count
    assert abs(total["est"] - 6000) <= 0.05 * 6000

    # same run-id replay: byte-identical answers
    assert runner.main(["--out", str(tmp_path / "o2"), "--run-id", "r1", *args]) == 0
    replay = spark.read.parquet(f"{tmp_path}/o2/hll_uniqueness").toPandas()
    t2 = replay[replay.window_id.isnull()].iloc[0]
    assert t2["est"] == total["est"] and t2["n_rows"] == total["n_rows"]

    # new run-id over the same corpus: estimates unchanged, n_rows doubled
    assert runner.main(["--out", str(tmp_path / "o3"), "--run-id", "r2", *args]) == 0
    again = spark.read.parquet(f"{tmp_path}/o3/hll_uniqueness").toPandas()
    t3 = again[again.window_id.isnull()].iloc[0]
    assert t3["est"] == total["est"]
    assert t3["n_rows"] == 2 * total["n_rows"]
    per_w1 = first[first.window_id.notnull()].set_index("window_id")["est"]
    per_w3 = again[again.window_id.notnull()].set_index("window_id")["est"]
    assert per_w1.equals(per_w3)
