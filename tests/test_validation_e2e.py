"""End-to-end slice: synthetic images table → stats pass → constraint
verdicts + violation rows → drift kernels flag exactly the planted windows
(the analog of reproducing the reference's golden drifts_set1.txt,
/root/reference/logs/gan/drifts_set1.txt)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark import suite as S
from al_drift_detection_spark.datagen import generate_images, generate_reference
from al_drift_detection_spark.drift import build_reference_sample, drift_scores, sliding_window_scores
from al_drift_detection_spark.stats import global_rollup, melt_stats, stats_pass

N = 8000
RPW = 1000  # rows per window → 8 windows, windows 6,7 drifted


@pytest.fixture(scope="module")
def images(spark):
    df = generate_images(spark, N, rows_per_window=RPW, windows_per_part=2).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def ref(spark):
    df = generate_reference(spark, N, rows_per_window=RPW, windows_per_part=2).cache()
    df.count()
    return df


def test_datagen_shape_and_determinism(spark, images):
    assert images.count() == N
    assert set(images.columns) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "part", "window_id"
    }
    # deterministic under different partitioning
    again = generate_images(spark, 200, rows_per_window=RPW, num_partitions=3)
    once = generate_images(spark, 200, rows_per_window=RPW, num_partitions=7)
    a = {r["image_id"]: (r["phash"], r["caption"]) for r in again.collect()}
    b = {r["image_id"]: (r["phash"], r["caption"]) for r in once.collect()}
    assert a == b


def test_stats_pass_matches_pandas(spark, images):
    wide = stats_pass(images, ["w", "h"], id_cols=["image_id"]).toPandas()
    pdf = images.select("part", "w", "h", "image_id").toPandas()
    for part, grp in pdf.groupby("part"):
        row = wide[wide["part"] == part].iloc[0]
        assert row["n_rows"] == len(grp)
        assert row["w__min"] == grp["w"].min()
        assert row["w__max"] == grp["w"].max()
        assert row["w__avg"] == pytest.approx(grp["w"].mean(), rel=1e-9)
        assert row["w__std"] == pytest.approx(grp["w"].std(ddof=1), rel=1e-9)
        # sketches within tolerance (SURVEY.md §5: HLL within 5%, quantiles approximate)
        assert row["image_id__approx_distinct"] == pytest.approx(grp["image_id"].nunique(), rel=0.05)
        assert row["w__q50"] == pytest.approx(grp["w"].median(), abs=2.0)


def test_melt_and_global_rollup(spark, images):
    wide = stats_pass(images, ["w"], part_col="part")
    long = melt_stats(wide).toPandas()
    assert {"part", "column", "metric", "value"} <= set(long.columns)
    assert (long["metric"] == "n_rows").sum() == wide.count()

    glob = global_rollup(wide, ["w"]).toPandas().iloc[0]
    pdf = images.select("w").toPandas()["w"]
    assert glob["avg"] == pytest.approx(pdf.mean(), rel=1e-9)
    assert glob["std"] == pytest.approx(pdf.std(ddof=1), rel=1e-6)
    assert glob["min"] == pdf.min() and glob["max"] == pdf.max()


def _suite() -> S.CheckSuite:
    return S.CheckSuite(
        checks=[
            S.non_empty("caption"),
            S.in_set("fmt", ["png", "jpeg"]),
            S.between("w", 1, 200),
            S.gt("h", 0),
            S.unique("image_id"),
            S.referential("phash"),
        ],
        numeric_stat_cols=["w", "h"],
        id_stat_cols=["image_id", "phash"],
    )


def test_constraint_verdicts_and_violations(spark, images, ref):
    res = _suite().run(images, ref=ref.select("phash"))
    verd = res.verdicts.toPandas()
    viol = res.violations.toPandas()
    pdf = images.toPandas()

    # planted violations exist and are found
    exp_empty = ((pdf["caption"].isna()) | (pdf["caption"] == "")).sum()
    got_empty = verd[verd["check_name"] == "non_empty_caption"]["n_violations"].sum()
    assert got_empty == exp_empty and exp_empty > 0

    exp_fmt = (~pdf["fmt"].isin(["png", "jpeg"])).sum()
    got_fmt = verd[verd["check_name"] == "in_set_fmt"]["n_violations"].sum()
    assert got_fmt == exp_fmt and exp_fmt > 0

    exp_h = (pdf["h"] <= 0).sum()
    assert verd[verd["check_name"] == "gt_h"]["n_violations"].sum() == exp_h and exp_h > 0

    # uniqueness: n_violations == rows whose key occurs >1 time anywhere
    # (all copies, exactly once each — no local/cross double counting even for
    # keys duplicated both within and across partitions)
    n_dupe_rows = (pdf.groupby("image_id")["image_id"].transform("count") > 1).sum()
    got_uni = verd[verd["check_name"] == "unique_image_id"]["n_violations"].sum()
    assert got_uni == n_dupe_rows and got_uni > 0

    # referential: orphan phashes flagged
    ref_set = set(r["phash"] for r in ref.select("phash").collect())
    exp_orphans = (~pdf["phash"].isin(ref_set)).sum()
    got_orph = verd[verd["check_name"] == "referential_phash"]["n_violations"].sum()
    assert got_orph == exp_orphans and exp_orphans > 0

    # violation rows carry usable samples
    assert len(viol) > 0
    assert {"row_id", "check_name", "column", "observed", "expected"} <= set(viol.columns)
    assert (viol["check_name"] == "in_set_fmt").any()
    # duplicate-key rows surface as violation rows, and both copies appear
    dup_viol = viol[viol["check_name"] == "unique_image_id"]
    assert len(dup_viol) > 0
    assert (dup_viol.groupby("observed").size() >= 2).all()
    # verdict column well-formed
    assert set(verd["verdict"]) <= {"pass", "fail"}


def test_drift_flags_planted_windows(spark, images):
    # reference sample = first 4 (clean) windows
    ref_rows = images.filter(F.col("window_id") < 4)
    ref_samples = build_reference_sample(ref_rows, ["w", "h"])
    scores = drift_scores(images, ["w", "h"], ref_samples).toPandas()

    votes = scores[(scores["kernel"] == "vote") & (scores["column"] == "w")]
    flagged = set(votes[votes["verdict"] == "fail"]["window_id"])
    assert flagged == {6, 7}, f"expected planted windows {{6,7}}, got {flagged}"

    # KS p-values near 1 for clean windows drawn from the same distribution
    ks = scores[(scores["kernel"] == "ks") & (scores["column"] == "w")]
    clean_p = ks[ks["window_id"] < 4]["p_value"]
    assert (clean_p > 0.001).all()


def test_drift_extra_kernels_advisory_rows(spark, images):
    """extra_kernels adds advisory wasserstein/js rows that flag the planted
    windows, without touching the default output or the vote."""
    ref_rows = images.filter(F.col("window_id") < 4)
    ref_samples = build_reference_sample(ref_rows, ["w"])
    base = drift_scores(images, ["w"], ref_samples).toPandas()
    ext = drift_scores(
        images, ["w"], ref_samples, extra_kernels=("wasserstein", "js")
    ).toPandas()

    # default kernels + vote byte-identical to the base call
    assert set(base["kernel"]) == {"ks", "psi", "mmd_rbf", "vote"}
    core = ext[ext["kernel"].isin(["ks", "psi", "mmd_rbf", "vote"])]
    key = ["part", "window_id", "column", "kernel"]
    b = base.sort_values(key).reset_index(drop=True)
    c = core.sort_values(key).reset_index(drop=True)
    assert (b["verdict"] == c["verdict"]).all()
    assert np.allclose(b["statistic"], c["statistic"])

    for k in ("wasserstein", "js"):
        rows = ext[(ext["kernel"] == k) & (ext["column"] == "w")]
        flagged = set(rows[rows["verdict"] == "fail"]["window_id"])
        assert flagged == {6, 7}, (k, flagged)

    # r6 advisory additions: CvM + Anderson-Darling flag the same planted
    # windows through the shared _advisory_rows implementation
    edf = drift_scores(
        images, ["w"], ref_samples, extra_kernels=("cvm", "ad")
    ).toPandas()
    for k in ("cvm", "ad"):
        rows = edf[(edf["kernel"] == k) & (edf["column"] == "w")]
        flagged = set(rows[rows["verdict"] == "fail"]["window_id"])
        assert flagged == {6, 7}, (k, flagged)

    with pytest.raises(ValueError, match="unknown extra_kernels"):
        drift_scores(images, ["w"], ref_samples, extra_kernels=("nope",))


def test_wasserstein_constant_reference_not_masked(spark):
    """A degenerate CONSTANT reference column must not silently 'pass' a
    shifted current window (ADVICE r3), and the statistic must stay
    UNITLESS at every scale: sd falls back to std(cur), then to 0/+inf when
    both sides are constant (drift._w1_statistic)."""
    from al_drift_detection_spark.drift import drift_scores

    ref_samples = {"v": np.full(256, 5.0)}
    rng = np.random.default_rng(3)
    rows = [(0, 0, 5.0)] * 64  # identical constant
    rows += [(0, 1, 9.0)] * 64  # both-constant shift → +inf
    rows += [(0, 2, float(v)) for v in 9.0 + 0.01 * rng.standard_normal(64)]
    df = spark.createDataFrame(rows, "part int, window_id int, v double")
    out = drift_scores(df, ["v"], ref_samples, extra_kernels=("wasserstein",)).toPandas()
    w = out[out["kernel"] == "wasserstein"].set_index("window_id").sort_index()
    # identical constant window: W1 = 0 → pass
    assert w.loc[0]["statistic"] == 0.0
    assert w.loc[0]["verdict"] == "pass"
    # both sides constant but shifted: maximal drift at ANY unit scale
    assert np.isinf(w.loc[1]["statistic"])
    assert w.loc[1]["verdict"] == "fail"
    # constant ref, jittery shifted current: normalized by std(cur) → huge
    assert w.loc[2]["statistic"] > 100
    assert w.loc[2]["verdict"] == "fail"

    # the statistic is UNIT-FREE even on the constant-reference fallback
    # path: the same shape at 1e-3 and 1e12 native units must score
    # identically (the raw-W1 fallback varied by 15 orders of magnitude)
    base = rng.standard_normal(64)
    stats = []
    for scale in (1e-3, 1e12):
        sref = {"v": np.full(256, 5.0 * scale)}
        rows_s = [(0, 0, float((5.0 + 0.01 * b) * scale)) for b in base]
        sdf = spark.createDataFrame(rows_s, "part int, window_id int, v double")
        sout = drift_scores(sdf, ["v"], sref, extra_kernels=("wasserstein",)).toPandas()
        stats.append(float(sout[sout["kernel"] == "wasserstein"].iloc[0]["statistic"]))
    assert stats[0] == pytest.approx(stats[1], rel=1e-6), stats


def test_categorical_drift_flags_new_category(spark):
    """A window containing a category absent from the reference map must
    spike the statistic (eps-floored expected mass), and windows matching the
    reference must pass."""
    from al_drift_detection_spark.drift import categorical_drift
    from al_drift_detection_spark.kernels import chi2_sf

    rows = []
    # windows 0-2: 60/40 png/jpeg per the reference; window 3: webp appears
    for w in range(3):
        rows += [(w, "png")] * 60 + [(w, "jpeg")] * 40
    rows += [(3, "png")] * 40 + [(3, "jpeg")] * 20 + [(3, "webp")] * 40
    df = spark.createDataFrame(rows, "window_id int, fmt string")
    out = (
        categorical_drift(df, "fmt", {"png": 0.6, "jpeg": 0.4})
        .toPandas()
        .set_index("window_id")
        .sort_index()
    )
    assert (out.loc[:2]["verdict"] == "pass").all()
    assert out.loc[3]["verdict"] == "fail"
    assert out.loc[3]["chi2_stat"] > 1000  # 40 obs vs ~eps expected
    # dof covers the union of ref + observed categories
    assert (out["dof"] == 2).all()
    assert (out["n"] == 100).all()

    # NULL values are a first-class category, not silently dropped: a window
    # suddenly full of nulls must fail, and n must still count every row
    null_rows = [(0, "png")] * 60 + [(0, "jpeg")] * 40 + [(1, None)] * 50 + [(1, "png")] * 50
    ndf = spark.createDataFrame(null_rows, "window_id int, fmt string")
    nout = (
        categorical_drift(ndf, "fmt", {"png": 0.6, "jpeg": 0.4})
        .toPandas()
        .set_index("window_id")
        .sort_index()
    )
    assert nout.loc[0]["verdict"] == "pass"
    assert nout.loc[1]["verdict"] == "fail"
    assert (nout["n"] == 100).all()
    assert (nout["dof"] == 2).all()  # {png, jpeg, (null)} − 1
    # p-value column consistent with the kernel SF
    got = out.loc[0]
    assert got["p_value"] == pytest.approx(chi2_sf(got["chi2_stat"], int(got["dof"])), abs=1e-9)

    with pytest.raises(ValueError, match="ref_props is empty"):
        categorical_drift(df, "fmt", {})


def test_sliding_window_scores(spark, images):
    scores = sliding_window_scores(images, ["w"], offset=1).toPandas()
    votes = scores[scores["kernel"] == "vote"]
    # window 6 vs 5 is the drift onset boundary → must fail
    onset = votes[(votes["window_id"] == 6)]
    assert (onset["verdict"] == "fail").any()
    # interior clean boundary (2 vs 1, same part) passes
    interior = votes[(votes["window_id"] == 3)]
    assert (interior["verdict"] == "pass").all()


def test_sliding_extra_kernels(spark, images):
    scores = sliding_window_scores(
        images, ["w"], offset=1, extra_kernels=("wasserstein", "js")
    ).toPandas()
    for k in ("wasserstein", "js"):
        rows = scores[scores["kernel"] == k]
        assert len(rows) > 0
        # drift onset (6 vs 5) flagged; interior clean boundary (3 vs 2) not
        assert (rows[rows["window_id"] == 6]["verdict"] == "fail").any(), k
        assert (rows[rows["window_id"] == 3]["verdict"] == "pass").all(), k
    # vote rows unaffected by the advisory kernels
    votes = scores[scores["kernel"] == "vote"]
    assert set(votes["statistic"].unique()) <= {0.0, 1.0, 2.0, 3.0}


def test_sliding_window_scores_big_window_bounded(spark):
    """A window far larger than sample_cap, spread over many partitions, is
    bounded JVM-side BEFORE the pair union/group (VERDICT r4 #1 — mirror of
    test_embedding_drift_big_window_bounded): verdicts unchanged (clean pair
    passes, shifted pair fails) and the per-pair group materializes
    O(sample_cap) rows, never two full windows. Bound check: run the SAME
    sampled plan up to the pre-group frame and count rows per pair role."""
    import pandas as pd

    from al_drift_detection_spark.drift import _bounded_window_sample

    rng = np.random.default_rng(13)
    n_big, cap = 40_000, 1024
    vals = np.concatenate([
        rng.standard_normal(n_big),        # window 0
        rng.standard_normal(n_big),        # window 1: same dist → pair 1 passes
        rng.standard_normal(n_big) + 3.0,  # window 2: shifted → pair 2 fails
    ])
    pdf = pd.DataFrame({
        "part": 0,
        "window_id": [0] * n_big + [1] * n_big + [2] * n_big,
        "w": vals,
    })
    df = spark.createDataFrame(pdf).repartition(16)
    scores = (
        sliding_window_scores(df, ["w"], offset=1, max_n=512, sample_cap=cap)
        .toPandas()
    )
    votes = scores[scores["kernel"] == "vote"].set_index("window_id")
    assert votes.loc[1, "verdict"] == "pass"
    assert votes.loc[2, "verdict"] == "fail"
    # the bound itself: the sampled pre-group frame keeps ≈ 2·cap rows per
    # window (binomial; generous upper bound), never the full 40k
    kept = (
        _bounded_window_sample(df.select("part", "window_id", "w"), "window_id", cap)
        .groupBy("window_id").count().toPandas().set_index("window_id")
    )
    for w in (0, 1, 2):
        assert 1400 <= kept.loc[w, "count"] <= 3000, kept.loc[w, "count"]


def test_decode_validation(spark, images, ref):
    from al_drift_detection_spark.decode import decode_checks

    out = decode_checks(images, ref).toPandas()
    assert (out["check_name"] == "decode_ok").any()
    assert (out["check_name"] == "dims_match").any()
    assert (out["check_name"] == "psnr_ge_40").any()
    assert (out["check_name"] == "phash_match").any()
    assert (out["check_name"] == "caption_match").any()


def test_unique_count_within_and_across_parts(spark):
    """Pin the unique-check count semantics: a key duplicated both WITHIN and
    ACROSS partitions is counted once per row (all copies), never double
    (the old local + cross formula over-reported and could exceed n_rows)."""
    rows = [
        # key "d" twice in part 0 AND once in part 1 → 3 violating rows
        (0, "r0", "d"), (0, "r1", "d"), (1, "r2", "d"),
        # unique keys
        (0, "r3", "x"), (1, "r4", "y"), (1, "r5", "z"),
    ]
    df = spark.createDataFrame(rows, "part int, image_id string, k string")
    suite = S.CheckSuite(checks=[S.unique("k")], part_col="part", row_id_col="image_id")
    res = suite.run(df)
    verd = {r["part"]: r["n_violations"] for r in res.verdicts.collect()}
    assert verd == {0: 2, 1: 1}
    # and every copy appears exactly once as a violation row
    viol = res.violations.toPandas()
    dup = viol[viol["check_name"] == "unique_k"]
    assert sorted(dup["row_id"]) == ["r0", "r1", "r2"]


def test_reference_sample_built_spark_side(spark, images):
    """The Spark-side percentile pass must equal numpy's linear-interpolation
    quantiles at p_j = j/(k−1) — the bounded sorted sample the kernels
    consume — without collecting the full reference projection to the driver."""
    ref_rows = images.filter(F.col("window_id") < 4)
    got = build_reference_sample(ref_rows, ["w", "h"], max_n=512)
    pdf = ref_rows.select("w", "h").toPandas()
    ps = np.arange(512) / 511.0
    for c in ("w", "h"):
        vals = pdf[c].dropna().to_numpy(np.float64)
        exp = np.quantile(vals, ps, method="linear")
        assert len(got[c]) == 512
        assert np.allclose(got[c], exp, rtol=1e-9, atol=1e-9)
    # n ≤ max_n reproduces the sorted values themselves
    small = images.filter(F.col("window_id") == 0).limit(100)
    got_small = build_reference_sample(small, ["w"], max_n=512)
    exp_small = np.sort(small.select("w").toPandas()["w"].to_numpy(np.float64))
    assert np.allclose(got_small["w"], exp_small)


def test_reference_sample_empty_column_raises(spark):
    df = spark.createDataFrame([(None,), (None,)], "w double")
    with pytest.raises(ValueError, match="empty"):
        build_reference_sample(df, ["w"])


def test_suite_from_json_config(spark, images, ref, tmp_path_factory):
    """The declarative JSON suite config (S6: the reference's feature-file
    idea) builds a suite identical to the coded one — same verdicts."""
    import json

    cfg = {
        "part_col": "part",
        "row_id_col": "image_id",
        "numeric_stat_cols": ["w", "h"],
        "id_stat_cols": ["image_id", "phash"],
        "checks": [
            {"kind": "non_empty", "column": "caption"},
            {"kind": "in_set", "column": "fmt", "values": ["png", "jpeg"]},
            {"kind": "between", "column": "w", "lo": 1, "hi": 200},
            {"kind": "gt", "column": "h", "value": 0},
            {"kind": "unique", "column": "image_id"},
            {"kind": "referential", "column": "phash"},
        ],
    }
    p = tmp_path_factory.mktemp("cfg") / "suite.json"
    p.write_text(json.dumps(cfg))
    from_json = S.suite_from_json(str(p)).run(images, ref=ref.select("phash"))
    coded = _suite().run(images, ref=ref.select("phash"))
    a = from_json.verdicts.toPandas().sort_values(["part", "check_name"]).reset_index(drop=True)
    b = coded.verdicts.toPandas().sort_values(["part", "check_name"]).reset_index(drop=True)
    assert a.equals(b)
    # unknown kinds are rejected loudly
    with pytest.raises(ValueError, match="unknown check kind"):
        S.suite_from_config({"checks": [{"kind": "nope", "column": "x"}]})


def test_decode_batch_vectorized_row_parity():
    """The r8 shape-grouped vectorized _decode_batch must emit EXACTLY the
    rows of the row-at-a-time form (any order): same violation decisions,
    same rendered observed/expected strings, over a batch containing every
    planted-corruption class (truncated blob, dims mismatch, noisy PSNR,
    orphan phash, caption null/empty/mismatch, sub-8x8 tiny images)."""
    import numpy as np
    import pandas as pd

    from al_drift_detection_spark.codec import average_phash, decode_blob, psnr
    from al_drift_detection_spark.datagen import _make_row
    from al_drift_detection_spark.decode import PSNR_MIN_DB, _decode_batch

    recs = [_make_row(i, 42, 12, 500, 2) for i in range(6000)]
    # add tiny images (per-row phash fallback path) and a shape-mismatched ref
    from al_drift_detection_spark.codec import encode_pixels

    tiny = np.arange(12, dtype=np.uint8).reshape(3, 4)
    recs.append(dict(recs[0], image_id="tiny_1", blob=encode_pixels(tiny, "png"),
                     w=4, h=3, phash=average_phash(tiny),
                     ref_blob=encode_pixels(tiny, "png")))
    big = np.zeros((16, 16), dtype=np.uint8)
    recs.append(dict(recs[1], image_id="mismatch_ref",
                     blob=encode_pixels(big, "png"), w=16, h=16,
                     phash=average_phash(big),
                     ref_blob=encode_pixels(tiny, "png")))
    pdf = pd.DataFrame(
        {
            "part": [r["part"] for r in recs],
            "image_id": [r["image_id"] for r in recs],
            "bytes": [r["blob"] for r in recs],
            "w": [r["w"] for r in recs],
            "h": [r["h"] for r in recs],
            "caption": [r["caption"] for r in recs],
            "phash": [r["phash"] for r in recs],
            "ref_bytes": [r["ref_blob"] for r in recs],
            "ref_caption": [r["ref_caption"] for r in recs],
        }
    )

    # row-at-a-time reference (the pre-r8 implementation, verbatim logic)
    rows = []
    for t in pdf.itertuples(index=False):
        part, rid = int(t.part), t.image_id
        px = decode_blob(t.bytes)
        if px is None:
            rows.append((part, rid, "decode_ok", "bytes", "corrupt", "decodable"))
            continue
        dh, dw = px.shape
        if dw != t.w or dh != t.h:
            rows.append((part, rid, "dims_match", "w,h", f"({t.w},{t.h})", f"({dw},{dh})"))
        ref_px = decode_blob(t.ref_bytes)
        if ref_px is not None:
            p = psnr(ref_px, px)
            if p < PSNR_MIN_DB:
                rows.append((part, rid, "psnr_ge_40", "bytes", f"{p:.2f}dB", f">={PSNR_MIN_DB}dB"))
        got_hash = average_phash(px)
        if got_hash != t.phash:
            rows.append((part, rid, "phash_match", "phash", str(t.phash), str(got_hash)))
        if t.caption != t.ref_caption:
            rows.append(
                (part, rid, "caption_match", "caption",
                 "NULL" if t.caption is None else str(t.caption)[:64],
                 str(t.ref_caption)[:64])
            )
    want = sorted(rows)
    got = sorted(map(tuple, _decode_batch(pdf).itertuples(index=False)))
    assert len(want) > 50  # the planted strides produced every class
    assert {r[2] for r in want} == {
        "decode_ok", "dims_match", "psnr_ge_40", "phash_match", "caption_match"
    }
    assert got == want
