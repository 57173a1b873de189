"""Single-scan combined streaming pass (streaming/closed.closed_multi,
VERDICT r6 Next #1): every closed-window verdict family in ONE streaming
query over ONE read of the feed. Parity contract: the split per-family
outputs are row-identical to the share-nothing per-family queries on the
same staged feed — same rows, same schemas, same emission semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

BASE = pd.Timestamp("2026-01-01 00:00:00")
N_WINDOWS = 4
ROWS_PER_WINDOW = 500


def _meta(spark):
    """Small images-meta frame (the runner --stream input shape): 4
    positional windows, reference-like in 0-1, drifted w + caption nulls +
    planted duplicates in window 3."""
    rng = np.random.default_rng(7)
    rows = []
    for wid in range(N_WINDOWS):
        drifted = wid == 3
        for i in range(ROWS_PER_WINDOW):
            dup = drifted and i % 3 == 0  # uniqueness drop in window 3
            rows.append({
                "image_id": f"img_{wid}_{0 if dup else i}",
                "fmt": ["png", "jpeg", "bmp"][i % 3] if not drifted
                else ["png", "webp"][i % 2],
                "caption": None if (drifted and i % 4 == 0) or i % 50 == 0
                else f"cap {i}",
                "w": float(rng.normal(512 if not drifted else 700, 30)),
                "h": float(rng.normal(384, 20)),
                "window_id": wid,
            })
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf).withColumn(
        "w", F.col("w").cast("int")
    ).withColumn("h", F.col("h").cast("int"))


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    from al_drift_detection_spark.streaming.driver import (
        build_references,
        stage_bounded_stream,
    )

    root = tmp_path_factory.mktemp("combined")
    stage = str(root / "stage")
    meta = _meta(spark)
    stage_bounded_stream(meta, stage, 300, 60)
    refs = build_references(
        meta, ref_windows=2, cat_cols=["fmt"], slice_pairs=[("fmt", "w")],
        cond_pairs=[("fmt", "caption")],
    )
    return stage, refs


@pytest.fixture(scope="module")
def both_outputs(spark, staged, tmp_path_factory):
    from al_drift_detection_spark.streaming.driver import (
        run_closed_streams,
        run_closed_streams_combined,
    )

    stage, refs = staged
    out_sep = str(tmp_path_factory.mktemp("sep"))
    out_comb = str(tmp_path_factory.mktemp("comb"))
    c_sep = run_closed_streams(spark, stage, out_sep, refs, ["fmt"])
    c_comb = run_closed_streams_combined(spark, stage, out_comb, refs, ["fmt"])
    return out_sep, c_sep, out_comb, c_comb


def test_combined_counts_match_share_nothing(both_outputs):
    _, c_sep, _, c_comb = both_outputs
    assert c_sep == c_comb
    # non-vacuous: every family emitted its windows
    assert all(v > 0 for v in c_sep.values())


def test_combined_rows_match_share_nothing_per_family(spark, both_outputs):
    """The split per-family sinks of the combined pass equal the
    share-nothing sinks row-for-row: identical schemas, identical values
    (exact for counts/strings/verdicts; 1e-9 for the float statistics whose
    pairwise-sum order can differ across merge orders)."""
    out_sep, c_sep, out_comb, _ = both_outputs
    for name in c_sep:
        a = spark.read.parquet(f"{out_sep}/{name}")
        b = spark.read.parquet(f"{out_comb}/{name}")
        assert a.schema == b.schema, name
        sort_cols = [c for c in a.columns]
        pa = a.orderBy(*sort_cols).toPandas().reset_index(drop=True)
        pb = b.orderBy(*sort_cols).toPandas().reset_index(drop=True)
        assert len(pa) == len(pb), name
        for col, dtype in a.dtypes:
            if dtype == "double":
                assert np.allclose(
                    pa[col].astype(float), pb[col].astype(float),
                    rtol=1e-9, atol=1e-12, equal_nan=True,
                ), f"{name}.{col}"
            else:
                assert pa[col].where(pa[col].notna(), None).tolist() == \
                    pb[col].where(pb[col].notna(), None).tolist(), f"{name}.{col}"


def test_combined_verdicts_see_planted_drift(spark, both_outputs):
    """Non-vacuous parity: the planted window-3 drift actually fails in the
    combined output (w shift → drift vote; dup surge → uniqueness;
    caption nulls → completeness; webp mix → cat drift)."""
    _, _, out_comb, _ = both_outputs

    def wid(pdf):
        return ((pdf["window_start"] - BASE).dt.total_seconds() // 300).astype(int)

    drift = spark.read.parquet(f"{out_comb}/stream_drift").toPandas()
    drift["wid"] = wid(drift)
    votes = drift[(drift["kernel"] == "vote") & (drift["column"] == "w")]
    assert votes.set_index("wid")["verdict"].loc[3] == "fail"
    assert (votes.set_index("wid")["verdict"].loc[[0, 1, 2]] == "pass").all()

    uniq = spark.read.parquet(f"{out_comb}/stream_uniqueness").toPandas()
    uniq["wid"] = wid(uniq)
    assert uniq.set_index("wid")["verdict"].loc[3] == "fail"

    cat = spark.read.parquet(f"{out_comb}/stream_cat_drift_fmt").toPandas()
    cat["wid"] = wid(cat)
    assert cat.set_index("wid")["verdict"].loc[3] == "fail"

    # caption nulls hit window 3's png slice only: webp rows sit on odd i
    # (i % 2 == 1) so the i % 4 == 0 null plant never touches them —
    # brand-new webp lands in '(other)' with ZERO nulls and passes against
    # the empty-tail 0.0 baseline; jpeg/bmp are absent from the drifted mix
    cc = spark.read.parquet(
        f"{out_comb}/stream_cond_completeness_fmt_caption"
    ).toPandas()
    cc["wid"] = wid(cc)
    w3 = cc[cc["wid"] == 3].set_index("category")
    assert w3.loc["png", "verdict"] == "fail"
    assert w3.loc["(other)", "verdict"] == "pass"
    assert w3.loc["(other)", "null_ratio"] == 0.0
    assert w3.loc["jpeg", "verdict"] == "no_data"
    assert (cc[cc["wid"] < 3].query("n_cur >= 50")["verdict"] == "pass").all()


def test_combined_is_one_scan_one_stateful_op(spark, staged):
    """The whole point: the combined query's plan has exactly ONE streaming
    source and ONE stateful operator for all families, and it passes the
    streaming pre-reduction audit (the `_pre_ts` mapInPandas sits under the
    dispatcher)."""
    from al_drift_detection_spark.streaming.closed import closed_multi
    from al_drift_detection_spark.streaming.driver import (
        STAGE_DDL,
        _with_bucket,
        stream_specs,
    )
    from tests.test_plans import analyzed_of, audit_streaming_stateful

    stage, refs = staged
    src = _with_bucket(
        spark.readStream.schema(STAGE_DDL).parquet(stage), refs
    )
    generic = closed_multi(src, "ts", stream_specs(refs, ["fmt"]))
    plan = analyzed_of(generic)
    assert plan.count("StreamingRelation") == 1
    assert plan.count("FlatMapGroupsInPandasWithState") == 1
    assert plan.count("MapInPandas") == 1  # ONE pre-reducer for all families
    assert not audit_streaming_stateful(plan), audit_streaming_stateful(plan)


def test_combined_cli(spark, tmp_path_factory):
    """`runner --stream --stream-combined` end-to-end: same sinks, same
    golden as the share-nothing CLI (volume passes all 6 windows; the
    generic stream_combined sink exists)."""
    from al_drift_detection_spark import runner

    out = str(tmp_path_factory.mktemp("cli") / "out")
    rc = runner.main([
        "--images", "synthetic:6000", "--out", out, "--stream",
        "--stream-combined", "--cat-drift", "fmt", "--master", "local[8]",
    ])
    assert rc == 0
    gen = spark.read.parquet(f"{out}/stream_combined")
    assert set(gen.select("check").distinct().toPandas()["check"]) == {
        "stream_drift", "stream_health", "stream_uniqueness",
        "stream_quantiles", "stream_association", "stream_frequent",
        "stream_cat_drift_fmt",
    }
    health = spark.read.parquet(f"{out}/stream_health").toPandas()
    vol = health[health["check"] == "volume"]
    assert len(vol) == 3  # synthetic:6000 → 3 positional windows
    assert (vol["verdict"] == "pass").all()
