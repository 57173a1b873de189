"""Sequential change detectors (functions/changepoint) + the round-6 kernel
additions (kernels.cvm_2samp / energy_distance): numpy-twin parity, planted
level shifts alarming where planted (and nowhere earlier), and plan-shape
sanity (one aggregate over raw rows; ordered windows only above it)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark.functions.changepoint import ddm_levels, page_hinkley
from al_drift_detection_spark.kernels import cvm_2samp, energy_distance

RNG = np.random.default_rng(7)


# ---- kernels: CvM ----------------------------------------------------------
def rank_cvm(ref: np.ndarray, cur: np.ndarray) -> float:
    """Classic rank-based two-sample CvM (Anderson 1962):
    U/(n·m·N) − (4mn−1)/(6N). Valid for tie-free data."""
    n, m = len(ref), len(cur)
    N = n + m
    combined = np.sort(np.concatenate([ref, cur]))
    r = np.searchsorted(combined, np.sort(ref)) + 1
    s = np.searchsorted(combined, np.sort(cur)) + 1
    u = n * np.sum((r - np.arange(1, n + 1)) ** 2) + m * np.sum(
        (s - np.arange(1, m + 1)) ** 2
    )
    return float(u / (n * m * N) - (4 * m * n - 1) / (6 * N))


def test_cvm_matches_rank_formula_tie_free():
    a = RNG.normal(0, 1, 311)
    b = RNG.normal(0.4, 1.2, 233)
    assert cvm_2samp(a, b) == pytest.approx(rank_cvm(a, b), abs=1e-10)


def test_cvm_identical_and_shifted():
    a = RNG.normal(0, 1, 400)
    assert cvm_2samp(a, a) == pytest.approx(0.0, abs=1e-12)
    b = RNG.normal(2.0, 1, 400)
    assert cvm_2samp(a, b) > 10 * cvm_2samp(a, a + 0.01)


def test_cvm_handles_ties():
    # heavy ties: ECDF form must stay finite, symmetric, zero on equality
    a = np.repeat([1.0, 2.0, 3.0], 50)
    b = np.repeat([1.0, 2.0, 4.0], 50)
    assert cvm_2samp(a, a) == pytest.approx(0.0, abs=1e-12)
    assert cvm_2samp(a, b) == pytest.approx(cvm_2samp(b, a), abs=1e-12)
    assert cvm_2samp(a, b) > 0


# ---- kernels: energy distance ----------------------------------------------
def brute_energy(a: np.ndarray, b: np.ndarray) -> float:
    if a.ndim == 1:
        a, b = a[:, None], b[:, None]
    d = lambda x, y: np.mean(
        np.sqrt(((x[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    )
    return 2 * d(a, b) - d(a, a) - d(b, b)


def test_energy_distance_matches_bruteforce_1d_and_nd():
    a1, b1 = RNG.normal(0, 1, 80), RNG.normal(0.7, 1, 90)
    assert energy_distance(a1, b1) == pytest.approx(brute_energy(a1, b1), rel=1e-10)
    a2, b2 = RNG.normal(0, 1, (60, 5)), RNG.normal(0.5, 1, (70, 5))
    assert energy_distance(a2, b2) == pytest.approx(brute_energy(a2, b2), rel=1e-10)


def test_energy_distance_zero_on_identical_and_detects_shift():
    a = RNG.normal(0, 1, (100, 4))
    assert energy_distance(a, a) == pytest.approx(0.0, abs=1e-9)
    assert energy_distance(a, a + 1.5) > 1.0


# ---- page_hinkley over a planted level shift -------------------------------
def _series(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "t long, x double"
    )


def test_page_hinkley_alarms_at_planted_shift(spark):
    vals = [10.0 + 0.01 * (i % 3) for i in range(30)] + [13.0] * 20
    out = (
        page_hinkley(_series(spark, vals), "t", "x", delta=0.05, threshold=5.0)
        .orderBy("t")
        .collect()
    )
    alarms = [r["t"] for r in out if r["alarm"]]
    assert alarms, "planted +3.0 shift never alarmed"
    assert min(alarms) >= 30, "alarm fired before the planted shift"
    # the increase side carries the alarm; mt keeps accumulating after
    first = next(r for r in out if r["alarm"])
    assert first["ph_inc"] > 5.0 and first["ph_dec"] < 5.0


def test_page_hinkley_quiet_on_stationary_series(spark):
    # dedicated generator: alarm-free-ness must not depend on how many draws
    # earlier tests consumed from the shared module RNG
    vals = 10.0 + 0.3 * np.random.default_rng(11).standard_normal(50)
    out = page_hinkley(_series(spark, vals), "t", "x", delta=0.05, threshold=5.0)
    assert out.filter(F.col("alarm")).count() == 0


def test_page_hinkley_decrease_side(spark):
    vals = [10.0] * 30 + [7.0] * 20
    out = page_hinkley(_series(spark, vals), "t", "x", delta=0.05, threshold=5.0)
    hit = out.filter(F.col("alarm")).orderBy("t").first()
    assert hit is not None and hit["ph_dec"] > 5.0


# ---- windowed DDM -----------------------------------------------------------
def _err_series(spark, pairs):
    return spark.createDataFrame(
        [(i, int(n), int(e)) for i, (n, e) in enumerate(pairs)],
        "t long, n long, err long",
    )


def test_ddm_levels_on_planted_error_jump(spark):
    # 20 clean windows at p≈0.05, then the error rate quadruples
    pairs = [(500, 25)] * 20 + [(500, 200)] * 10
    out = ddm_levels(_err_series(spark, pairs), "t", "n", "err").orderBy("t").collect()
    assert all(r["level"] == 0 for r in out[:20])
    assert out[-1]["level"] == 2, "sustained 4x error jump must reach drift level"
    assert any(r["level"] >= 1 for r in out[20:]), "warning level never reached"
    # the stored minimum register froze at the clean-period minimum
    assert out[-1]["p_min"] == pytest.approx(0.05, abs=0.01)


def test_ddm_stays_quiet_on_stationary_errors(spark):
    pairs = [
        (500, 24 + int(k)) for k in np.random.default_rng(13).integers(0, 4, 25)
    ]
    out = ddm_levels(_err_series(spark, pairs), "t", "n", "err")
    assert out.filter(F.col("level") == 2).count() == 0


def test_ddm_p_min_is_earliest_on_ties(spark):
    # two windows with identical (p, s) prefixes — argmin must pick the first
    pairs = [(100, 10), (100, 10), (100, 50)]
    out = ddm_levels(_err_series(spark, pairs), "t", "n", "err").orderBy("t").collect()
    # cumulative p: 0.1, 0.1, then jump; s shrinks with n so ps_min is at t=1;
    # ties in ps between distinct rows resolve to the earliest t
    assert out[0]["p_min"] == pytest.approx(out[0]["p_cum"])
    assert out[2]["p_min"] == pytest.approx(0.1, abs=1e-9)


# ---- CLI surface -------------------------------------------------------------
def test_changepoint_cli_alarms_on_planted_windows(spark, tmp_path):
    """`runner --changepoint` over the synthetic corpus: Page-Hinkley must
    alarm exactly on the planted-drift windows (4, 5 — where the batch vote
    fails) and stay quiet on the clean reference era; DDM on the stationary
    caption-null rate must report level 0 everywhere."""
    from al_drift_detection_spark import runner

    out = str(tmp_path / "cp")
    rc = runner.main([
        "--images", "synthetic:12000", "--out", out, "--changepoint",
        "--master", "local[8]",
    ])
    assert rc == 0
    cp = spark.read.parquet(f"{out}/changepoint").toPandas()
    assert set(cp["column"]) == {"w", "h"}
    w_alarms = sorted(cp[(cp["column"] == "w") & cp["alarm"]]["window_id"])
    assert w_alarms == [4, 5]
    assert not cp[(cp["window_id"] < 4) & cp["alarm"]].shape[0]
    ddm = spark.read.parquet(f"{out}/ddm_nullrate").toPandas()
    assert len(ddm) == 6 and (ddm["level"] == 0).all()
    # CUSUM vs the reference-window baseline on the same standardized series:
    # the planted w shift must alarm within the drift era and nowhere earlier
    cu = spark.read.parquet(f"{out}/cusum").toPandas()
    assert set(cu["column"]) == {"w", "h"}
    w_cu = cu[cu["column"] == "w"]
    assert w_cu[w_cu["alarm"]]["window_id"].min() in (4, 5)
    assert not cu[(cu["window_id"] < 4) & cu["alarm"]].shape[0]


# ---- registry plan shape ----------------------------------------------------
def test_detector_entries_aggregate_before_ordered_windows(spark):
    """The sequential detectors must reduce raw rows with ONE aggregate before
    any ordered window / prefix join runs (the O(windows)-series contract in
    the module docstring) — their plans pass the registry-wide audit because
    an Aggregate sits in every window subtree."""
    from al_drift_detection_spark.operators import REGISTRY
    from tests.test_plans import SF, audit_window_shapes, plan_of

    for q in ("q_page_hinkley", "q_ddm_error_rate", "q_hll_uniqueness"):
        assert not audit_window_shapes(plan_of(REGISTRY[q].fn(spark, SF))), q


# ---- kernels: Anderson-Darling ----------------------------------------------
def pettitt_ad(x: np.ndarray, y: np.ndarray) -> float:
    """Independent continuous two-sample AD (Pettitt 1976 M_j-rank form) —
    the tie-free classic the midrank A²akN perturbs by O(1/N)."""
    n, m = len(x), len(y)
    N = n + m
    pooled = np.sort(np.concatenate([x, y]))
    M = np.searchsorted(np.sort(x), pooled, side="right")[: N - 1]
    j = np.arange(1, N)
    return float(np.sum((M * N - j * n) ** 2 / (j * (N - j))) / (n * m))


def test_ad_close_to_pettitt_on_tie_free_data():
    from al_drift_detection_spark.kernels import ad_2samp

    rng = np.random.default_rng(3)
    a, b = rng.normal(0, 1, 400), rng.normal(0, 1, 350)
    got, ref = ad_2samp(a, b), pettitt_ad(a, b)
    assert got == pytest.approx(ref, rel=0.02)


def test_ad_null_shift_and_tail_behavior():
    from al_drift_detection_spark.kernels import ad_2samp

    rng = np.random.default_rng(5)
    a = rng.normal(0, 1, 400)
    null = ad_2samp(a, rng.normal(0, 1, 400))
    assert null < 3  # E[A²] ≈ 1 under the null (heavy-tailed, hence slack)
    assert ad_2samp(a, rng.normal(0.5, 1, 400)) > 10
    # pure SCALE drift (tails) — the case AD exists for
    assert ad_2samp(a, rng.normal(0, 1.8, 400)) > 10
    # ties stay finite; identical samples score 0
    t = np.repeat([1.0, 2.0, 3.0], 80)
    assert ad_2samp(t, t) == pytest.approx(0.0, abs=1e-12)
    assert np.isfinite(ad_2samp(t, np.repeat([1.0, 2.0, 4.0], 80)))


def test_ad_registry_entry_matches_kernel(spark):
    """The relational A²akN must equal the numpy kernel on the same split —
    the same distinct-value/midrank algebra through two implementations."""
    import pandas as pd

    from al_drift_detection_spark.kernels import ad_2samp
    from al_drift_detection_spark.operators import REGISTRY
    from tests.test_plans import SF

    got = REGISTRY["q_ad_drift"].fn(spark, SF).head()["ad_stat"]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    ref = ev[ev.event_id % 2 == 0]["value"].to_numpy()
    cur = ev[ev.event_id % 2 == 1]["value"].to_numpy()
    assert got == pytest.approx(ad_2samp(ref, cur), abs=1e-6)


# ---- EWMA control chart -------------------------------------------------------
def test_ewma_registry_entry_matches_recurrence(spark):
    """The prefix-join expansion must equal the textbook recurrence
    z_t = λx_t + (1−λ)z_{t−1} run directly in numpy, limits included."""
    import pandas as pd

    from al_drift_detection_spark.operators import REGISTRY
    from tests.test_plans import SF

    rows = (
        REGISTRY["q_ewma_control"].fn(spark, SF).orderBy("window_id").toPandas()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    series = (
        ev.assign(w=ev.event_id // 500).groupby("w")["value"].mean().sort_index()
    )
    lam, big_l = 0.2, 3.0
    mu0 = series.iloc[:4].mean()
    sd0 = series.iloc[:4].std(ddof=1)
    z = mu0
    for t, (w, x) in enumerate(series.items(), start=1):
        z = lam * x + (1 - lam) * z
        band = big_l * sd0 * np.sqrt(lam / (2 - lam) * (1 - (1 - lam) ** (2 * t)))
        row = rows[rows.window_id == w].iloc[0]
        assert row["z"] == pytest.approx(z, abs=1e-5), w
        assert row["ucl"] == pytest.approx(mu0 + band, abs=1e-5), w
        assert bool(row["signal"]) == bool(z > mu0 + band or z < mu0 - band), w


# ---- two-sided tabular CUSUM -------------------------------------------------
def recursive_cusum(xs, mu, k):
    """The textbook recursion (Page 1954) the closed prefix form must equal."""
    si, sd, out_i, out_d = 0.0, 0.0, [], []
    for x in xs:
        si = max(0.0, si + x - mu - k)
        sd = max(0.0, sd + mu - x - k)
        out_i.append(si)
        out_d.append(sd)
    return np.array(out_i), np.array(out_d)


def test_cusum_closed_form_equals_recursion():
    from al_drift_detection_spark.kernels import cusum_2sided

    xs = np.random.default_rng(3).normal(10.0, 1.0, 200)
    xs[120:] += 2.5
    si, sd = cusum_2sided(xs, mu=10.0, k=0.5)
    ri, rd = recursive_cusum(xs, 10.0, 0.5)
    np.testing.assert_allclose(si, ri, atol=1e-9)
    np.testing.assert_allclose(sd, rd, atol=1e-9)


def test_cusum_levels_alarms_at_planted_shift(spark):
    from al_drift_detection_spark.functions.changepoint import cusum_levels

    vals = [10.0 + 0.01 * (i % 5) for i in range(30)] + [12.0] * 20
    out = (
        cusum_levels(_series(spark, vals), "t", "x", ref_upto=30, threshold=5.0)
        .orderBy("t")
        .collect()
    )
    alarms = [r["t"] for r in out if r["alarm"]]
    assert alarms, "planted +2.0 shift never alarmed"
    assert min(alarms) >= 30, "alarm fired inside the in-control reference"
    first = next(r for r in out if r["alarm"])
    assert first["s_inc"] > 5.0 and first["s_dec"] < 5.0


def test_cusum_levels_decrease_side_and_stationary(spark):
    from al_drift_detection_spark.functions.changepoint import cusum_levels

    vals = [10.0] * 30 + [8.0] * 20
    out = cusum_levels(_series(spark, vals), "t", "x", ref_upto=30, threshold=5.0)
    hit = out.filter(F.col("alarm")).orderBy("t").first()
    assert hit is not None and hit["s_dec"] > 5.0
    quiet = 10.0 + 0.3 * np.random.default_rng(17).standard_normal(50)
    out2 = cusum_levels(_series(spark, quiet), "t", "x", ref_upto=50, threshold=5.0)
    assert out2.filter(F.col("alarm")).count() == 0


def test_cusum_spark_matches_kernel(spark):
    from al_drift_detection_spark.functions.changepoint import cusum_levels
    from al_drift_detection_spark.kernels import cusum_2sided

    xs = np.random.default_rng(9).normal(5.0, 2.0, 60)
    xs[40:] -= 3.0
    rows = (
        cusum_levels(_series(spark, xs), "t", "x", ref_upto=20, threshold=25.0)
        .orderBy("t")
        .collect()
    )
    mu = float(np.mean(xs[:20]))
    k = 0.5 * float(np.std(xs[:20], ddof=1))
    si, sd = cusum_2sided(xs, mu, k)
    np.testing.assert_allclose([r["s_inc"] for r in rows], si, atol=1e-8)
    np.testing.assert_allclose([r["s_dec"] for r in rows], sd, atol=1e-8)
    assert rows[0]["mu"] == pytest.approx(mu) and rows[0]["k"] == pytest.approx(k)


def test_cusum_degenerate_reference_falls_back_to_zero_slack(spark):
    from al_drift_detection_spark.functions.changepoint import cusum_levels

    out = (
        cusum_levels(_series(spark, [10.0, 10.0, 10.0, 11.0]), "t", "x",
                     ref_upto=1, threshold=5.0)
        .orderBy("t")
        .collect()
    )
    # single-row reference: stddev is NULL -> k = 0, statistics stay finite
    assert out[0]["k"] == 0.0
    assert all(np.isfinite(r["s_inc"]) and np.isfinite(r["s_dec"]) for r in out)


def test_cusum_entry_aggregates_before_ordered_windows(spark):
    from al_drift_detection_spark.operators import REGISTRY
    from tests.test_plans import SF, audit_window_shapes, plan_of

    assert not audit_window_shapes(plan_of(REGISTRY["q_cusum"].fn(spark, SF)))
