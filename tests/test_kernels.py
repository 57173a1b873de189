"""Kernel unit tests vs independent numpy references (SURVEY.md §5: KS vs
brute-force ECDF, PSI vs a 10-line numpy reference, MMD vs direct Gram)."""

from __future__ import annotations

import numpy as np
import pytest

from al_drift_detection_spark.kernels import (
    chi2_2samp,
    chi2_sf,
    js_divergence,
    kolmogorov_sf,
    ks_2samp,
    mmd_rbf,
    psi,
    subsample,
    wasserstein_1d,
)

RNG = np.random.default_rng(42)


def brute_ks(a, b):
    grid = np.concatenate([a, b])
    fa = np.array([(a <= x).mean() for x in grid])
    fb = np.array([(b <= x).mean() for x in grid])
    return np.max(np.abs(fa - fb))


def test_ks_stat_matches_bruteforce():
    a = RNG.normal(0, 1, 300)
    b = RNG.normal(0.5, 1.3, 200)
    d, p = ks_2samp(a, b)
    assert d == pytest.approx(brute_ks(a, b), abs=1e-12)
    assert 0.0 <= p <= 1.0


def test_ks_identical_samples():
    a = RNG.normal(0, 1, 500)
    d, p = ks_2samp(a, a)
    assert d == 0.0
    assert p == 1.0


def test_ks_detects_shift_and_pvalue_scale():
    a = RNG.normal(0, 1, 2000)
    b = RNG.normal(1.0, 1, 2000)
    d, p = ks_2samp(a, b)
    assert d > 0.3
    assert p < 1e-6
    # same distribution → p typically large
    c = RNG.normal(0, 1, 2000)
    d2, p2 = ks_2samp(a, c)
    assert p2 > 0.01


def theta_form_sf(lam: float, terms: int = 100) -> float:
    """Independent Kolmogorov SF via the Jacobi theta-function identity:
    P(K ≤ λ) = (√(2π)/λ) Σ_{k≥1} exp(−(2k−1)²π²/(8λ²))."""
    k = np.arange(1, terms)
    cdf = np.sqrt(2 * np.pi) / lam * np.sum(np.exp(-((2 * k - 1) ** 2) * np.pi**2 / (8 * lam**2)))
    return 1.0 - cdf


def test_kolmogorov_sf_vs_theta_form():
    for lam in (0.5, 0.8, 1.0, 1.2, 1.5, 2.0):
        assert kolmogorov_sf(lam) == pytest.approx(theta_form_sf(lam), abs=1e-12), lam
    assert kolmogorov_sf(0.0) == 1.0
    assert kolmogorov_sf(5.0) < 1e-10


def ref_psi(ref, cur, bins=10, eps=1e-4):
    qs = np.quantile(ref, np.linspace(0, 1, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    qs = np.unique(qs)
    pr = np.clip(np.histogram(ref, qs)[0] / len(ref), eps, None)
    pc = np.clip(np.histogram(cur, qs)[0] / len(cur), eps, None)
    pr, pc = pr / pr.sum(), pc / pc.sum()
    return np.sum((pc - pr) * np.log(pc / pr))


def test_psi_matches_reference_impl():
    a = RNG.normal(0, 1, 1000)
    b = RNG.normal(0.3, 1, 1000)
    assert psi(a, b) == pytest.approx(ref_psi(a, b), rel=1e-12)


def test_psi_stable_vs_shifted():
    a = RNG.normal(0, 1, 5000)
    b = RNG.normal(0, 1, 5000)
    assert psi(a, b) < 0.05
    c = RNG.normal(1.5, 1, 5000)
    assert psi(a, c) > 0.25


def test_psi_constant_column():
    a = np.full(100, 3.0)
    assert psi(a, a) == 0.0


def ref_mmd(X, Y, gamma):
    def k(A, B):
        d = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return np.exp(-gamma * d)

    n, m = len(X), len(Y)
    kxx, kyy, kxy = k(X, X), k(Y, Y), k(X, Y)
    return (
        (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
        + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
        - 2 * kxy.mean()
    )


def test_mmd_matches_direct_gram():
    X = RNG.normal(0, 1, (80, 3))
    Y = RNG.normal(0.5, 1, (90, 3))
    got = mmd_rbf(X, Y, gamma=0.5)
    assert got == pytest.approx(ref_mmd(X, Y, 0.5), rel=1e-10)


def test_mmd_same_vs_shifted():
    X = RNG.normal(0, 1, 800)
    Y = RNG.normal(0, 1, 800)
    Z = RNG.normal(2.0, 1, 800)
    assert abs(mmd_rbf(X, Y)) < 0.01
    assert mmd_rbf(X, Z) > 0.1


def test_subsample_deterministic_and_bounded():
    x = np.arange(10000.0)
    s1, s2 = subsample(x, 100), subsample(x, 100)
    assert len(s1) == 100
    assert np.array_equal(s1, s2)
    assert s1[0] == 0.0 and s1[-1] == 9999.0


# ---- chi-square ----------------------------------------------------------

# classic chi-square table: (critical value, dof) → upper-tail 0.05 / 0.01
CHI2_TABLE = [
    (3.841, 1, 0.05),
    (5.991, 2, 0.05),
    (16.919, 9, 0.05),
    (6.635, 1, 0.01),
    (21.666, 9, 0.01),
]


def test_chi2_sf_golden_table():
    for x, k, p in CHI2_TABLE:
        assert chi2_sf(x, k) == pytest.approx(p, abs=5e-4), (x, k)
    assert chi2_sf(0.0, 3) == 1.0
    assert chi2_sf(1e6, 3) == 0.0


def test_chi2_sf_subnormal_x_warning_free():
    """Subnormal x where 0.5*x underflows to 0.0 must return 1.0 without the
    np.log(0) RuntimeWarning it used to emit inside executor pandas UDFs
    (ADVICE r3, kernels.py early-out guard)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning becomes a failure
        assert chi2_sf(5e-324, 1) == 1.0
        assert chi2_sf(1e-320, 9) == 1.0
        assert chi2_sf(0.01, 3) < 1.0  # normal small x still computes


def test_chi2_sf_monotone_in_x():
    xs = np.linspace(0.01, 50, 200)
    for k in (1, 2, 5, 9, 20):
        vals = [chi2_sf(x, k) for x in xs]
        assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:])), k


def test_chi2_2samp_matches_direct_contingency():
    a = RNG.integers(0, 6, 500)
    b = RNG.integers(0, 6, 700)
    stat, dof, p = chi2_2samp(a, b)
    # independent direct computation over the 2×K table
    cats = np.unique(np.concatenate([a, b]))
    obs = np.array([[(a == c).sum() for c in cats], [(b == c).sum() for c in cats]], float)
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    assert stat == pytest.approx(((obs - exp) ** 2 / exp).sum(), rel=1e-12)
    assert dof == len(cats) - 1
    assert 0.0 <= p <= 1.0


def test_chi2_2samp_identical_and_shifted():
    a = np.repeat(np.arange(5), 200)
    stat, dof, p = chi2_2samp(a, a)
    assert stat == pytest.approx(0.0, abs=1e-12)
    assert p == pytest.approx(1.0, abs=1e-12)
    b = RNG.integers(0, 5, 1000)
    c = RNG.integers(2, 7, 1000)  # shifted category support
    stat2, _, p2 = chi2_2samp(b, c)
    assert stat2 > 100 and p2 < 1e-6


def test_chi2_zero_observed_cell_contributes_expected_mass():
    # 'cur' never shows category 2 — the zero cell must still add e to stat
    a = np.array([0, 0, 1, 1, 2, 2])
    b = np.array([0, 0, 1, 1, 1, 1])
    stat, dof, _ = chi2_2samp(a, b)
    assert dof == 2
    obs = np.array([[2, 2, 2], [2, 4, 0]], float)
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    assert stat == pytest.approx(((obs - exp) ** 2 / exp).sum(), rel=1e-12)


# ---- Jensen-Shannon ------------------------------------------------------


def test_js_symmetric_bounded_zero_on_identical():
    a = RNG.normal(0, 1, 2000)
    b = RNG.normal(0.8, 1.2, 2000)
    assert js_divergence(a, a) == pytest.approx(0.0, abs=1e-12)
    j1, j2 = js_divergence(a, b), js_divergence(b, a)
    assert 0.0 < j1 <= np.log(2) + 1e-12
    # not exactly symmetric in sample form (bins come from the first arg's
    # quantiles) — but both directions must agree on drift vs no drift
    assert j2 > 0.0
    c = RNG.normal(0, 1, 2000)
    assert js_divergence(a, c) < 0.05


def ref_js(ref, cur, bins=10):
    """Independent JS reference: histogram KLs to the mixture, ref-quantile
    bins with open tails (the same binning policy psi()/js_divergence use)."""
    qs = np.quantile(ref, np.linspace(0, 1, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    qs = np.unique(qs)
    p = np.histogram(ref, qs)[0] / len(ref)
    q = np.histogram(cur, qs)[0] / len(cur)
    m = (p + q) / 2
    out = 0.0
    for pi, qi, mi in zip(p, q, m):
        out += 0.5 * (pi * np.log(pi / mi) if pi > 0 else 0.0)
        out += 0.5 * (qi * np.log(qi / mi) if qi > 0 else 0.0)
    return out


def test_js_matches_reference_impl():
    a = RNG.normal(0, 1, 1500)
    b = RNG.normal(1.0, 2.0, 1100)
    assert js_divergence(a, b) == pytest.approx(ref_js(a, b), rel=1e-12)


def test_js_far_shift_approaches_tail_bound():
    # a shift past the whole ref support: only the open last quantile bin
    # overlaps, so JSD is high but (by construction of open tails) < ln 2
    a = np.linspace(0, 1, 500)
    b = np.linspace(100, 101, 500)
    got = js_divergence(a, b)
    assert got == pytest.approx(ref_js(a, b), rel=1e-12)
    assert 0.5 < got < np.log(2)


# ---- Wasserstein-1 -------------------------------------------------------


def test_wasserstein_shift_identity():
    a = RNG.normal(0, 1, 1000)
    assert wasserstein_1d(a, a) == 0.0
    for c in (0.25, 1.0, 3.5):
        assert wasserstein_1d(a, a + c) == pytest.approx(c, rel=1e-12)


def test_wasserstein_equal_n_sorted_mean_identity():
    a = RNG.normal(0, 1, 800)
    b = RNG.normal(0.5, 2.0, 800)
    expect = np.mean(np.abs(np.sort(a) - np.sort(b)))
    assert wasserstein_1d(a, b) == pytest.approx(expect, rel=1e-10)


def test_wasserstein_unequal_n_vs_quadrature():
    a = RNG.exponential(1.0, 600)
    b = RNG.exponential(1.5, 411)
    # independent check: dense quadrature of |ECDF difference|
    grid = np.linspace(min(a.min(), b.min()) - 1, max(a.max(), b.max()) + 1, 200_001)
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    quad = np.trapz(np.abs(fa - fb), grid)
    assert wasserstein_1d(a, b) == pytest.approx(quad, abs=2e-4)


def test_relational_drift_extensions_match_numpy(spark):
    """q_wasserstein and q_chi2_drift (hash-checked vs DuckDB separately) must
    also equal the numpy kernels on the same events split — the same
    verification triangle as test_relational_kernels_match_numpy."""
    from al_drift_detection_spark.operators import REGISTRY

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "value").toPandas()
    r = ev[ev["event_id"] % 2 == 0]["value"].to_numpy(np.float64)
    c = ev[ev["event_id"] % 2 == 1]["value"].to_numpy(np.float64)

    got_w = REGISTRY["q_wasserstein"].fn(spark, sf).first()
    assert got_w["w1"] == pytest.approx(wasserstein_1d(r, c), abs=1e-6)

    bins_r = np.clip(np.floor(r / 10).astype(np.int64), 0, 9)
    bins_c = np.clip(np.floor(c / 10).astype(np.int64), 0, 9)
    stat, dof, _ = chi2_2samp(bins_r, bins_c)
    got_x = REGISTRY["q_chi2_drift"].fn(spark, sf).first()
    assert got_x["chi2_stat"] == pytest.approx(stat, abs=1e-6)
    assert got_x["dof"] == dof


def test_relational_kernels_match_numpy(spark):
    """Close the verification triangle: the RELATIONAL q_ks_pvalue / q_mmd_rbf
    (already hash-checked vs DuckDB) must equal the NUMPY kernels on the same
    split of the events fixture."""
    import numpy as np

    from al_drift_detection_spark.kernels import ks_2samp, mmd_rbf
    from al_drift_detection_spark.operators import REGISTRY

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "value").toPandas()
    r = ev[ev["event_id"] % 2 == 0]["value"].to_numpy(np.float64)
    c = ev[ev["event_id"] % 2 == 1]["value"].to_numpy(np.float64)

    got = REGISTRY["q_ks_pvalue"].fn(spark, sf).first()
    d, p = ks_2samp(r, c)
    assert got["ks_stat"] == pytest.approx(d, abs=1e-6)
    assert got["p_value"] == pytest.approx(p, abs=1e-6)

    small = ev[ev["event_id"] < 400]
    r2 = small[small["event_id"] % 2 == 0]["value"].to_numpy(np.float64)
    c2 = small[small["event_id"] % 2 == 1]["value"].to_numpy(np.float64)
    got2 = REGISTRY["q_mmd_rbf"].fn(spark, sf).first()
    exp2 = mmd_rbf(r2, c2, gamma=0.001, max_n=10_000)  # no subsample
    assert got2["mmd2"] == pytest.approx(exp2, abs=1e-6)


def ref_hist_distances(ref, cur, bins=10):
    """Independent reference: direct histogram H/TV/BC on ref-quantile bins
    (the psi()/js_divergence binning policy)."""
    qs = np.quantile(ref, np.linspace(0, 1, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    qs = np.unique(qs)
    p = np.histogram(ref, qs)[0] / len(ref)
    q = np.histogram(cur, qs)[0] / len(cur)
    return (
        float(np.sqrt(np.sum((np.sqrt(p) - np.sqrt(q)) ** 2) / 2.0)),
        float(np.abs(p - q).sum() / 2.0),
        float(np.sqrt(p * q).sum()),
    )


def test_hist_distances_match_reference_impl():
    from al_drift_detection_spark.kernels import hist_distances

    a = RNG.normal(0, 1, 1800)
    b = RNG.normal(0.7, 1.4, 1300)
    got = hist_distances(a, b)
    want = ref_hist_distances(a, b)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)


def test_hist_distances_bounds_and_identities():
    from al_drift_detection_spark.kernels import hist_distances

    a = RNG.normal(0, 1, 2000)
    h0, tv0, bc0 = hist_distances(a, a)
    assert h0 == pytest.approx(0.0, abs=1e-12)
    assert tv0 == pytest.approx(0.0, abs=1e-12)
    assert bc0 == pytest.approx(1.0, abs=1e-12)
    b = RNG.normal(2.5, 1, 2000)
    h, tv, bc = hist_distances(a, b)
    assert 0.0 < h <= 1.0 and 0.0 < tv <= 1.0 and 0.0 <= bc < 1.0
    # H^2 = 1 - BC by definition; disjoint support saturates the bounds
    assert h * h == pytest.approx(1.0 - bc, abs=1e-12)
    hfar, tvfar, bcfar = hist_distances(np.linspace(0, 1, 500) + 0,
                                        np.linspace(100, 101, 500))
    # all cur mass lands in the open-tail last bin (1/10 of ref mass):
    # H = sqrt((0.9 + (1 - sqrt(0.1))^2) / 2), TV = 0.9, BC = sqrt(0.1)
    assert hfar == pytest.approx(np.sqrt((0.9 + (1 - np.sqrt(0.1)) ** 2) / 2), abs=1e-9)
    assert tvfar == pytest.approx(0.9, abs=1e-9)
    assert bcfar == pytest.approx(np.sqrt(0.1), abs=1e-9)
    # empty input reports "no drift evidence"; a constant ref still yields
    # the two open-tail bins (same policy as psi/js_divergence), so a spread
    # current sample correctly registers as drifted, identical constants as not
    assert hist_distances(np.array([]), a) == (0.0, 0.0, 1.0)
    assert hist_distances(np.ones(100), np.ones(50)) == (0.0, 0.0, 1.0)
    hc, tvc, bcc = hist_distances(np.ones(100), a)
    assert hc > 0.5 and tvc > 0.5 and bcc < 0.5


def test_mmd_ref_state_bit_exact():
    """mmd_rbf with the precomputed reference state (r8 drift_scores memo)
    must be BIT-identical to the direct form — same subsample, same
    squared-distance arithmetic, same median-heuristic gamma."""
    import numpy as np

    from al_drift_detection_spark.kernels import mmd_ref_state, mmd_rbf

    rng = np.random.default_rng(11)
    for n_ref, n_cur in [(1024, 2048), (7, 5), (1, 9), (300, 2)]:
        ref = rng.normal(0, 1, n_ref)
        cur = rng.normal(0.3, 1.2, n_cur)
        direct = mmd_rbf(ref, cur, max_n=512)
        state = mmd_ref_state(ref, max_n=512)
        cached = mmd_rbf(None, cur, max_n=512, ref_state=state)
        assert np.float64(direct).view(np.int64) == np.float64(cached).view(np.int64)
    # 2-D inputs (embedding path) too
    ref2 = rng.normal(0, 1, (200, 8))
    cur2 = rng.normal(0.1, 1, (100, 8))
    assert mmd_rbf(ref2, cur2, max_n=64) == mmd_rbf(
        None, cur2, max_n=64, ref_state=mmd_ref_state(ref2, max_n=64)
    )
