"""Store retention/compaction (functions/stores.py, VERDICT r6 Next #3):
the persisted snapshot stores — HLL sketches, histogram sketches, signature
generations, metrics runs — stay BOUNDED under many ingests, with answers
identical before/after compaction (lossless merges) or equal to the
retained horizon (metrics expiry), and the marker protocol makes every
step crash-invisible."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _ev(spark, base, n=400, card=120):
    return spark.range(base, base + n).select(
        (F.col("id") % 4).alias("w"),
        (F.col("id") % card).cast("string").alias("uid"),
        (F.col("id") % 997).cast("double").alias("x"),
    )


def _snap_dirs(store, part="_snapshot"):
    return [d for d in os.listdir(store) if d.startswith(part + "=")]


def _uniq_pdf(spark, store):
    from al_drift_detection_spark.functions.sketches import store_uniqueness

    return (
        store_uniqueness(spark, store, "w")
        .orderBy(F.col("w").asc_nulls_last())
        .toPandas()
        .reset_index(drop=True)
    )


def test_hll_compaction_answers_identical_and_bounded(spark, tmp_path):
    """Six ingests → compact keep_last=2: store_uniqueness answers (est AND
    n_rows, per-window and lifetime) are byte-identical; live snapshot dirs
    collapse to 2 + one merged dir; a second compaction after more ingests
    keeps the bound — the many-ingest boundedness stress."""
    from al_drift_detection_spark.functions.sketches import (
        compact_hll_store,
        update_hll_store,
    )
    from al_drift_detection_spark.functions.stores import allocate_snapshot_id

    store = str(tmp_path / "hll")
    for i in range(6):
        sid = allocate_snapshot_id(store, f"run{i}")
        update_hll_store(_ev(spark, 1000 * i), store, "uid", "w", sid)
    before = _uniq_pdf(spark, store)
    assert len(_snap_dirs(store)) == 6

    cut = compact_hll_store(spark, store, "w", keep_last=2)
    assert cut is not None
    after = _uniq_pdf(spark, store)
    pd.testing.assert_frame_equal(before, after)
    assert len(_snap_dirs(store)) == 2
    assert os.path.isdir(os.path.join(store, f"_compacted_{cut}"))

    # keep ingesting + compacting: the store never grows past the bound
    for i in range(6, 12):
        sid = allocate_snapshot_id(store, f"run{i}")
        update_hll_store(_ev(spark, 1000 * i), store, "uid", "w", sid)
        compact_hll_store(spark, store, "w", keep_last=1)
        assert len(_snap_dirs(store)) <= 1
        assert len([d for d in os.listdir(store) if d.startswith("_compacted_")]) == 1
    # answers still equal a freshly-built uncompacted twin
    twin = str(tmp_path / "hll_twin")
    for i in range(12):
        sid = allocate_snapshot_id(twin, f"run{i}")
        update_hll_store(_ev(spark, 1000 * i), twin, "uid", "w", sid)
    pd.testing.assert_frame_equal(_uniq_pdf(spark, store), _uniq_pdf(spark, twin))


def test_compaction_crash_matrix(spark, tmp_path):
    """Every crash point leaves answers unchanged: (1) merged dir written
    but no marker → invisible; (2) marker committed but vacuum skipped →
    stale snapshot dirs ignored; (3) vacuum → unchanged again."""
    from al_drift_detection_spark.functions.sketches import update_hll_store
    from al_drift_detection_spark.functions.stores import (
        allocate_snapshot_id,
        commit_level,
        vacuum_snapshot_store,
    )

    store = str(tmp_path / "hll")
    for i in range(4):
        update_hll_store(
            _ev(spark, 1000 * i), store, "uid", "w",
            allocate_snapshot_id(store, f"run{i}"),
        )
    base = _uniq_pdf(spark, store)

    # (1) merged rows for snapshots ≤ 2, written but NOT committed
    merged_src = spark.read.option("basePath", store).parquet(
        *[os.path.join(store, f"_snapshot={s}") for s in (0, 1, 2)]
    ).drop("_snapshot")
    merged = merged_src.groupBy("w").agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_union_agg("sketch").alias("sketch"),
    ).withColumn("est", F.hll_sketch_estimate("sketch"))
    merged.write.mode("overwrite").parquet(
        os.path.join(store, "_compacted_2", "_snapshot=2")
    )
    pd.testing.assert_frame_equal(base, _uniq_pdf(spark, store))

    # (2) marker committed, vacuum "crashed" (stale dirs 0..2 still present)
    commit_level(store, 2)
    pd.testing.assert_frame_equal(base, _uniq_pdf(spark, store))
    assert len(_snap_dirs(store)) == 4  # stale dirs really are present

    # (3) vacuum
    removed = vacuum_snapshot_store(store)
    assert removed == 3
    pd.testing.assert_frame_equal(base, _uniq_pdf(spark, store))
    assert len(_snap_dirs(store)) == 1


def test_histogram_compaction_answers_identical(spark, tmp_path):
    from al_drift_detection_spark.functions.histograms import (
        compact_histogram_store,
        store_quantiles,
        update_histogram_store,
    )
    from al_drift_detection_spark.functions.stores import allocate_snapshot_id

    store = str(tmp_path / "hist")

    def ans():
        return (
            store_quantiles(spark, store, [0.25, 0.5, 0.9], 0.0, 1000.0, 64)
            .orderBy(F.col("window").asc_nulls_last(), "q")
            .toPandas()
            .reset_index(drop=True)
        )

    for i in range(5):
        update_histogram_store(
            _ev(spark, 1000 * i), store, "x", "w", 0.0, 1000.0,
            allocate_snapshot_id(store, f"run{i}"), n_bins=64,
        )
    before = ans()
    cut = compact_histogram_store(spark, store, keep_last=1)
    assert cut is not None
    pd.testing.assert_frame_equal(before, ans())
    assert len(_snap_dirs(store)) == 1
    # the merged history is ONE set of histogram rows: bounded by the grid
    import glob

    merged_rows = spark.read.parquet(
        os.path.join(store, f"_compacted_{cut}", f"_snapshot={cut}")
    )
    assert merged_rows.count() <= 4 * 66  # windows × (bins + under/overflow)
    assert glob.glob(os.path.join(store, "_compacted_*")) == [
        os.path.join(store, f"_compacted_{cut}")
    ]


def test_signature_store_compaction_probe_identical(spark, tmp_path):
    """Two identical incremental-dedup stores; compact one; the NEXT ingest
    probes both and must emit identical pairs — and the compacted store's
    membership view has the same rows in O(1) directories."""
    from al_drift_detection_spark.functions.dedup import (
        compact_signature_store,
        incremental_minhash_pairs,
        read_signature_store,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog again today"),
        (1, "the quick brown fox jumps over the lazy dog again tomorrow"),
        (2, "completely different words about spark and parquet tables"),
        (3, "yet another unrelated document mentioning drift detection"),
        (4, "the quick brown fox jumps over the lazy dog again today"),
        (5, "fresh content for the third batch with no twin anywhere"),
    ]

    def docs(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        )

    s1, s2 = str(tmp_path / "a"), str(tmp_path / "b")
    for store in (s1, s2):
        for lo, hi in ((0, 2), (2, 4)):
            incremental_minhash_pairs(docs(texts[lo:hi]), store, k=16, bands=4)

    assert compact_signature_store(spark, s1, keep_last=0) is not None
    gens1 = [d for d in os.listdir(s1) if d.startswith("gen=")]
    assert gens1 == []  # all folded
    # identical row SETS (compare on the scalar key columns — signature
    # arrays aren't sortable in pandas; (id, band, bucket) identifies a row)
    key_cols = ["id", "band", "bucket"]
    r1 = read_signature_store(spark, s1).select(*key_cols).toPandas()
    r2 = read_signature_store(spark, s2).select(*key_cols).toPandas()
    pd.testing.assert_frame_equal(
        r1.sort_values(key_cols).reset_index(drop=True),
        r2.sort_values(key_cols).reset_index(drop=True),
    )

    p1 = incremental_minhash_pairs(docs(texts[4:6]), s1, k=16, bands=4)
    p2 = incremental_minhash_pairs(docs(texts[4:6]), s2, k=16, bands=4)
    got1 = p1.select("a_id", "b_id").toPandas().sort_values(["a_id", "b_id"])
    got2 = p2.select("a_id", "b_id").toPandas().sort_values(["a_id", "b_id"])
    pd.testing.assert_frame_equal(
        got1.reset_index(drop=True), got2.reset_index(drop=True)
    )
    assert (4, 0) in set(map(tuple, got1[["b_id", "a_id"]].values)) or (
        (0, 4) in set(map(tuple, got1[["a_id", "b_id"]].values))
    )  # cross-batch dup found through the compacted history
    # post-compaction appends number ABOVE the cutoff
    gens_after = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(s1) if d.startswith("gen=")
    )
    assert gens_after == [2]


def test_metrics_store_expiry_horizon_semantics(spark, tmp_path):
    """expire(keep_last_runs=3) on a 6-run store: history == exactly the
    newest 3 runs' rows (equal to filtering the full history to the same
    horizon); verdicts over the retained window match verdicts computed on
    that filtered history; expired partitions vacuumed; a NEW run slots in
    above the retained max."""
    from al_drift_detection_spark.functions.anomaly import (
        MetricsStore,
        anomaly_verdicts,
    )

    store = MetricsStore(str(tmp_path / "metrics"))

    def metrics(i):
        return spark.createDataFrame(
            pd.DataFrame({
                "part": [0, 0], "column": ["w", "w"],
                "metric": ["mean", "null_ratio"],
                "value": [500.0 + i, 0.01 * i],
            })
        )

    full_rows = []
    for i in range(6):
        ts = store.resolve_run_ts(spark, f"run{i}")
        store.append(metrics(i), f"run{i}", ts)
        full_rows.append((f"run{i}", ts))
    full = store.history(spark).toPandas()

    cutoff = store.expire(spark, keep_last_runs=3)
    assert cutoff == 2
    got = store.history(spark).toPandas().sort_values(
        ["run_ts", "metric"]).reset_index(drop=True)
    want = full[full["run_ts"] > 2].sort_values(
        ["run_ts", "metric"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    # vacuum really removed the expired partitions
    assert sorted(os.listdir(store.path)) >= []
    live = [d for d in os.listdir(store.path) if d.startswith("run_id=")]
    assert sorted(live) == ["run_id=run3", "run_id=run4", "run_id=run5"]

    # verdicts == verdicts on the equivalently-filtered history
    v_store = store.verdicts(
        metrics(9), "run9").orderBy("strategy", "metric").toPandas()
    v_manual = anomaly_verdicts(
        spark.createDataFrame(want[["part", "column", "metric", "value",
                                    "run_ts", "run_id"]]),
        metrics(9),
    ).orderBy("strategy", "metric").toPandas()
    pd.testing.assert_frame_equal(
        v_store.reset_index(drop=True), v_manual.reset_index(drop=True)
    )

    # a new run enters above the retained head; a replay of an EXPIRED
    # run-id is treated as new (documented)
    assert store.resolve_run_ts(spark, "run9") == 6
    assert store.resolve_run_ts(spark, "run0") == 6
    # a retained run keeps its position
    assert store.resolve_run_ts(spark, "run4") == 4


def test_runner_store_compact_cli(spark, tmp_path):
    """--store-compact-keep 1 across three runs: hll_uniqueness and
    hist_quantiles outputs equal the uncompacted twin's, and both stores
    hold at most one live snapshot + one merged dir."""
    from al_drift_detection_spark import runner

    def run(tag, compact):
        out = str(tmp_path / f"out_{tag}")
        hll = str(tmp_path / f"hll_{tag}")
        qs = str(tmp_path / f"qs_{tag}")
        for i in range(3):
            args = [
                "--images", "synthetic:6000", "--out", out,
                "--master", "local[8]", "--run-id", f"r{i}",
                "--hll-store", hll, "--quantile-store", qs,
            ]
            if compact:
                args += ["--store-compact-keep", "1"]
            assert runner.main(args) == 0
        return out, hll, qs

    out_c, hll_c, qs_c = run("c", True)
    out_p, hll_p, qs_p = run("p", False)
    for tbl in ("hll_uniqueness", "hist_quantiles"):
        a = spark.read.parquet(f"{out_c}/{tbl}").toPandas()
        b = spark.read.parquet(f"{out_p}/{tbl}").toPandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )
    assert len(_snap_dirs(hll_c)) <= 1 and len(_snap_dirs(qs_c)) <= 1
    assert len(_snap_dirs(hll_p)) == 3 and len(_snap_dirs(qs_p)) == 3
