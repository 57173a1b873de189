"""Physical-plan regression tests: the optimizations the engine depends on
must be visible in explain() output — pushdown, pruning, broadcast, top-k,
partial aggregation. A plan regression at 100 TB is an outage; these pin the
plan shape at test scale."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_filter_project"].fn(spark, SF))
    assert "PushedFilters: [" in p and "IsNotNull" in p or "GreaterThanOrEqual" in p
    # column pruning: scan must not read unprojected columns
    assert "l_shipdate" not in p.split("ReadSchema")[1][:300]


def test_broadcast_join_chosen(spark):
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_broadcast_join_agg"].fn(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_anti_join_broadcast(spark):
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_anti_join"].fn(spark, SF))
    assert "LeftAnti" in p


def test_topn_uses_take_ordered(spark):
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_topn_global"].fn(spark, SF))
    assert "TakeOrderedAndProject" in p  # no full global sort materialization


def test_agg_is_partial_then_final(spark):
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_tpch_q1"].fn(spark, SF))
    # map-side combine: two HashAggregate nodes around one small exchange
    assert p.count("HashAggregate") >= 2


def test_stats_pass_prunes_scan(spark):
    from al_drift_detection_spark.stats import stats_pass

    imgs_like = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = plan_of(stats_pass(imgs_like, ["l_quantity"], part_col="l_linenumber"))
    rs = p.split("ReadSchema")[1][:200]
    assert "l_quantity" in rs and "l_extendedprice" not in rs


def test_drift_scan_prunes_to_value_cols(spark):
    import numpy as np

    from al_drift_detection_spark.datagen import generate_images
    from al_drift_detection_spark.drift import drift_scores

    imgs = generate_images(spark, 100, rows_per_window=50)
    # write/read parquet so a real scan exists to prune
    import tempfile

    d = tempfile.mkdtemp()
    imgs.write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)
    p = plan_of(drift_scores(df, ["w", "h"], {"w": np.arange(10.0), "h": np.arange(10.0)}))
    rs = p.split("ReadSchema")[1][:300]
    assert "bytes" not in rs and "caption" not in rs  # blobs never scanned

def test_no_unpartitioned_windows_anywhere(spark):
    """Every Window in EVERY registry query must carry a non-empty partition
    spec (the two-pass bucketed form) — an unpartitioned Window.orderBy moves
    the whole table through ONE task at scale. Detection: in
    `windowspecdefinition(part..., order ASC/DESC ..., frame)` the partition
    columns come first, so a spec whose FIRST argument is an order column
    (carries ASC/DESC) is unpartitioned. Allowlist: q_regime_segments runs
    its window over the already-reduced O(windows) regime table (built from
    a driver collect) — a global sort of tiny data by design, documented in
    regimes.regime_segments."""
    import re

    from al_drift_detection_spark.operators import REGISTRY

    allow = {"q_regime_segments"}
    pat = re.compile(r"windowspecdefinition\([^,()]*? (ASC|DESC)")
    for q, spec in REGISTRY.items():
        if q in allow:
            continue
        p = plan_of(spec.fn(spark, SF))
        m = pat.search(p)
        assert not m, f"{q}: unpartitioned window: ...{p[max(0, m.start()-80):m.end()+40]}"


def test_quality_gate_single_scan_no_shuffle(spark):
    """quality_gate computes every signal in ONE projection: no Exchange, no
    join, no Python eval, exactly one parquet scan (joining two derivations
    of the same scan back together is the tfidf-double-scan review class)."""
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_quality_gate"].fn(spark, SF))
    assert "Exchange" not in p
    assert "Join" not in p
    assert "Python" not in p and "Arrow" not in p
    assert p.count("Scan parquet") == 1


def test_decontamination_broadcasts_benchmark(spark):
    """The benchmark shingle set must reach the corpus join as a broadcast —
    the corpus side never shuffles on the benchmark."""
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_decontamination"].fn(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_categorical_drift_one_table_aggregate(spark):
    """categorical_drift's only full-table work is the (window, cat) count:
    margins/grid run on the tiny aggregated frame and the grid side is
    broadcast. (The registry projection drops p_value, so Catalyst prunes
    the pandas UDF out of this plan entirely — the engine surface's UDF
    runs on O(windows) aggregated rows, pinned by the e2e test.)"""
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_categorical_drift"].fn(spark, SF))
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_zscore_broadcasts_scalars(spark):
    from al_drift_detection_spark.operators import REGISTRY

    p = plan_of(REGISTRY["q_zscore"].fn(spark, SF))
    assert "Window" not in p  # agg + broadcast crossJoin, not a global window
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
