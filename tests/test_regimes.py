"""Drift-regime identity golden test: plants one NOVEL and one RECURRING
drift and asserts the exact regime-id sequence — mirroring the reference's
verdict contract (/root/reference/gan.py:785-811) and the shape of its golden
drifts_set1.txt (`233 1 / 234 1 / 380 2 / 381 2`: ids, not booleans)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark.regimes import (
    assign_drift_regimes,
    catalog_from_df,
    catalog_to_df,
    window_sketches,
)

RPW = 800  # rows per window


@pytest.fixture(scope="module")
def planted(spark):
    """10 windows: 0-3 base, 4-5 shifted (+200, NOVEL), 6-7 base again
    (RECURRING regime 1), 8-9 shifted again (RECURRING regime 2)."""
    rng = np.random.default_rng(7)
    rows = []
    for w in range(10):
        shift = 200.0 if w in (4, 5, 8, 9) else 0.0
        vals = rng.uniform(0, 100, RPW) + shift
        part = w // 2
        rows += [(part, w, float(v)) for v in vals]
    return spark.createDataFrame(rows, "part int, window_id int, v double").cache()


def test_regime_id_sequence_golden(spark, planted):
    ref = {"v": planted.filter("window_id < 2").select("v").toPandas()["v"].to_numpy()}
    out = (
        assign_drift_regimes(planted, ["v"], ref)
        .orderBy("window_id")
        .toPandas()
    )
    # the drifts_set1.txt shape: base=1, novel drift mints 2, base recurs as 1,
    # the same drift recurs as 2
    assert out["regime_id"].tolist() == [1, 1, 1, 1, 2, 2, 1, 1, 2, 2]
    # only the first appearance of the shifted distribution is NEW
    assert out["is_new"].tolist() == [False] * 4 + [True] + [False] * 5
    # recurring windows match their catalog entry with a healthy p-value
    recur = out[(out["window_id"].isin([6, 8]))]
    assert (recur["matched_p"] > 0.05).all()


def test_regime_catalog_cap(spark):
    """Adversarial drift-EVERY-window data (each window a fresh disjoint
    distribution) would mint an unbounded catalog (VERDICT r4 item 8):
    max_regimes must either fail loudly (default) or bound memory via LRU
    eviction — never evicting regime 1 or the current regime, with evicted
    regimes re-minted as new when they recur."""
    rng = np.random.default_rng(43)
    n_windows, rpw = 12, 300
    rows = []
    for w in range(n_windows):
        # disjoint uniform bands → every window drifts vs everything before
        vals = rng.uniform(0, 50, rpw) + 1000.0 * w
        rows += [(0, w, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "part int, window_id int, v double")
    ref = {"v": np.asarray([float(x) for x in rng.uniform(0, 50, 400)])}

    # unbounded: window 0 shares the reference's band (inherits regime 1);
    # every other window mints → 11 novel regimes
    out = assign_drift_regimes(df, ["v"], ref).toPandas()
    assert out["is_new"].sum() == n_windows - 1

    # capped, default policy: loud failure instead of silent growth
    with pytest.raises(ValueError, match="max_regimes=4"):
        assign_drift_regimes(df, ["v"], ref, max_regimes=4)

    # capped with eviction: catalog stays bounded, every window still gets a
    # verdict row, and each novel window still mints (old ids forgotten)
    catalog: dict = {}
    out2 = (
        assign_drift_regimes(
            df, ["v"], ref, max_regimes=4, on_overflow="evict_lru",
            catalog=catalog,
        )
        .orderBy("window_id")
        .toPandas()
    )
    assert len(out2) == n_windows
    # every disjoint window (past the reference-band window 0) is novel
    assert out2["is_new"].tolist() == [False] + [True] * (n_windows - 1)
    assert len(catalog) <= 4
    assert 1 in catalog  # the reference regime is never evicted


def test_many_windows_streamed_assignment(spark):
    """Many-windows stress for the toLocalIterator catalog loop (VERDICT r3
    item 4): hundreds of windows stream through the driver in global window
    order — regime ids stay the planted alternating golden and every window
    gets exactly one row, same as the collect() form produced."""
    rng = np.random.default_rng(13)
    n_windows, rpw = 400, 40
    rows = []
    for w in range(n_windows):
        shift = 200.0 if (w // 50) % 2 == 1 else 0.0  # alternate every 50 windows
        rows += [(w // 8, w, float(v)) for v in rng.uniform(0, 100, rpw) + shift]
    df = spark.createDataFrame(rows, "part int, window_id int, v double").repartition(32)
    ref = {"v": rng.uniform(0, 100, 2000)}
    out = assign_drift_regimes(df, ["v"], ref, q=32).orderBy("window_id").toPandas()
    assert len(out) == n_windows
    assert out["window_id"].tolist() == list(range(n_windows))
    # base blocks are regime 1, every shifted block recurs as regime 2
    expect = [1 if (w // 50) % 2 == 0 else 2 for w in range(n_windows)]
    assert out["regime_id"].tolist() == expect
    # exactly one NEW regime ever minted (the first shifted block's onset)
    assert out["is_new"].sum() == 1 and out.loc[out["is_new"], "window_id"].item() == 50


def test_window_sketches_are_sorted_quantiles(spark, planted):
    sk = window_sketches(planted, ["v"], q=64).filter("window_id = 0").first()
    arr = np.asarray(sk["v"])
    assert len(arr) == 64
    assert (np.diff(arr) >= 0).all()  # sorted
    pdf = planted.filter("window_id = 0").select("v").toPandas()["v"]
    assert arr[0] == pytest.approx(pdf.min())
    assert arr[-1] == pytest.approx(pdf.max())


def test_catalog_roundtrip_and_resume(spark, planted):
    ref = {"v": planted.filter("window_id < 2").select("v").toPandas()["v"].to_numpy()}
    catalog: dict = {}
    assign_drift_regimes(planted, ["v"], ref, catalog=catalog).count()
    assert sorted(catalog) == [1, 2]

    # persist + reload the catalog (the checkpointable regime memory)
    reloaded = catalog_from_df(catalog_to_df(spark, catalog))
    assert sorted(reloaded) == [1, 2]
    for rid in (1, 2):
        assert np.allclose(reloaded[rid]["v"], catalog[rid]["v"])

    # resumed run over a THIRD distribution mints id 3, recognises 1 and 2
    rng = np.random.default_rng(11)
    rows = [(0, 100, float(v)) for v in rng.uniform(500, 600, RPW)]
    rows += [(0, 101, float(v)) for v in rng.uniform(0, 100, RPW)]
    more = spark.createDataFrame(rows, "part int, window_id int, v double")
    out2 = (
        assign_drift_regimes(more, ["v"], ref, catalog=reloaded)
        .orderBy("window_id")
        .toPandas()
    )
    assert out2["regime_id"].tolist() == [3, 1]
    assert out2["is_new"].tolist() == [True, False]


def test_runner_regimes_surface(spark, tmp_path_factory):
    """--regimes writes the orbit->drift_id verdict contract tables: a
    regimes parquet with inherited/new/recurring ids and a persisted
    catalog that a resumed run reloads."""
    from al_drift_detection_spark import runner

    out = str(tmp_path_factory.mktemp("run") / "out")
    # 12000 rows → 6 windows; datagen plants drift in the last two (4, 5)
    args = ["--images", "synthetic:12000", "--out", out, "--master", "local[8]",
            "--regimes"]
    assert runner.main(args) == 0
    reg = spark.read.parquet(f"{out}/regimes").toPandas().sort_values("window_id")
    assert {"part", "window_id", "regime_id", "is_new"} <= set(reg.columns)
    # the planted drift windows mint exactly one new regime (4 is new, 5 stays)
    assert reg["regime_id"].tolist() == [1, 1, 1, 1, 2, 2]
    assert reg["is_new"].tolist() == [False] * 4 + [True, False]
    # clean head windows inherit the reference regime 1
    assert (reg[reg["window_id"] < 2]["regime_id"] == 1).all()
    cat = spark.read.parquet(f"{out}/regime_catalog").toPandas()
    assert set(cat["regime_id"]) == set(reg["regime_id"])
    # the segment verdict table: clean head segment + one drifted segment
    segs = spark.read.parquet(f"{out}/regime_segments").toPandas().sort_values("segment_id")
    assert segs[["regime_id", "window_start", "window_end"]].values.tolist() == [
        [1, 0, 3], [2, 4, 5],
    ]

    # resumed run reloads the catalog: no new ids minted on identical data
    assert runner.main(args + ["--resume"]) == 0
    reg2 = spark.read.parquet(f"{out}/regimes").toPandas()
    assert set(reg2["regime_id"]) <= set(reg["regime_id"])


def test_runner_cat_drift_and_image_dedup_surfaces(spark, tmp_path_factory):
    """--cat-drift writes the per-window chi-square table (all windows pass:
    fmt is not planted to drift, dof = ref fmt categories + '(other)');
    --image-dedup writes a keep/drop row for EVERY image (random phashes
    have no ≤3-bit near-dups — no false positives)."""
    from al_drift_detection_spark import runner

    out = str(tmp_path_factory.mktemp("run2") / "out")
    args = ["--images", "synthetic:12000", "--out", out, "--master", "local[8]",
            "--cat-drift", "fmt", "--image-dedup"]
    assert runner.main(args) == 0

    cat = spark.read.parquet(f"{out}/cat_drift").toPandas().sort_values("window_id")
    assert cat["window_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert (cat["verdict"] == "pass").all()
    assert (cat["n"] == 2000).all()
    assert (cat["dof"] == 4).all()  # {jpeg, png, bmp, ""} + (other) − 1
    assert (cat["column"] == "fmt").all()

    dd = spark.read.parquet(f"{out}/image_dedup").toPandas()
    assert len(dd) == 12000
    assert dd["keep"].all()


def test_runner_cat_drift_other_literal_not_crash(spark, tmp_path_factory):
    """A column whose DATA contains the literal reserved '(other)' category
    must not abort the CLI (ADVICE r3), and — ADVICE r4 — a COMMON literal
    '(other)' (~10% here, identically distributed across windows) must not
    fail every window either: the runner remaps it to '(other:literal)' in
    both the reference props and the data, so it keeps its true expected
    mass and clean windows still pass."""
    from al_drift_detection_spark import runner
    from al_drift_detection_spark.datagen import generate_images

    from al_drift_detection_spark.datagen import generate_reference

    base = tmp_path_factory.mktemp("run3")
    inp, refp, out = str(base / "imgs"), str(base / "ref"), str(base / "out")
    imgs = generate_images(spark, 4000).drop("bytes")
    # BOTH reserved-shaped literals in the data: '(other)' remaps onto the
    # escaped label and their expected masses must SUM (overwriting one
    # would inflate chi2 in every window — review-caught)
    hostile = (
        F.when(F.xxhash64("image_id") % 10 == 0, F.lit("(other)"))
        .when(F.xxhash64("image_id") % 10 == 1, F.lit("(other:literal)"))
        .otherwise(F.col("fmt"))
    )
    imgs.withColumn("fmt", hostile).write.parquet(inp)
    generate_reference(spark, 4000).drop("ref_bytes").write.parquet(refp)

    args = ["--images", inp, "--ref", refp, "--out", out, "--master", "local[8]",
            "--cat-drift", "fmt"]
    assert runner.main(args) == 0
    cat = spark.read.parquet(f"{out}/cat_drift").toPandas()
    assert len(cat) > 0
    assert (cat["column"] == "fmt").all()
    # the remapped category keeps its expected mass → clean windows pass
    # (the r3 fold-into-eps-catch-all behavior failed ALL windows here)
    assert (cat["verdict"] == "pass").all()


def test_regime_segments_golden(spark, planted):
    """Segments over the planted regime sequence 1,1,1,1,2,2,1,1,2,2 collapse
    to exactly 4 segments — the reference's emitted verdict unit ('2 segments
    over 4 orbits')."""
    from al_drift_detection_spark.regimes import regime_segments

    ref = {"v": planted.filter("window_id < 2").select("v").toPandas()["v"].to_numpy()}
    regimes = assign_drift_regimes(planted, ["v"], ref)
    segs = regime_segments(regimes).toPandas()
    assert segs[["regime_id", "window_start", "window_end", "n_windows"]].values.tolist() == [
        [1, 0, 3, 4],
        [2, 4, 5, 2],
        [1, 6, 7, 2],
        [2, 8, 9, 2],
    ]


def test_window_sketches_matches_jvm_percentile(spark):
    """The r8 numpy-fold window_sketches must replicate Spark Percentile's
    exact linear-interpolation arithmetic BIT-FOR-BIT — same grid literals,
    same (higher−pos)·lo + (pos−lower)·hi formula, NaN-greatest order,
    NULL-excluded counts, all-NULL → NULL sketch — so every regime golden
    (and the driver's hash of q_drift_regimes-family outputs) is unchanged."""
    import numpy as np
    from pyspark.sql import functions as F

    from al_drift_detection_spark.regimes import window_sketches

    q = 128
    df = (
        spark.range(40_000)
        .select(
            (F.col("id") % 3).cast("int").alias("part"),
            (F.col("id") % 7).cast("int").alias("window_id"),
            # ties (quantized), NULLs, one all-NULL window, a NaN value
            F.when(F.col("id") % 11 == 0, None)
            .when(F.col("id") % 7 == 5, None)  # window 5: v all NULL
            .when(F.col("id") % 9999 == 17, float("nan"))
            .otherwise(F.round(F.rand(7) * 50, 1))
            .alias("v"),
            (F.rand(13) * 10).alias("u"),
        )
    )
    ps = (np.arange(q) / (q - 1)).tolist()
    ref = {
        (r["part"], r["window_id"]): (r["pv"], r["pu"])
        for r in df.groupBy("part", "window_id")
        .agg(
            F.percentile("v", F.lit(ps)).alias("pv"),
            F.percentile("u", F.lit(ps)).alias("pu"),
        )
        .collect()
    }
    got = {
        (r["part"], r["window_id"]): (r["v"], r["u"])
        for r in window_sketches(df, ["v", "u"], "part", "window_id", q).collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        for want, have in zip(ref[k], got[k]):
            if want is None or have is None:
                assert want == have, (k, want, have)
                continue
            # bit-exact: compare raw float64 bit patterns, NaN included
            wb = np.asarray(want, dtype=np.float64).view(np.int64)
            hb = np.asarray(have, dtype=np.float64).view(np.int64)
            assert (wb == hb).all(), (k, want[:5], have[:5])
