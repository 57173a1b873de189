"""Kernel unit tests vs independent numpy references (SURVEY.md §5: KS vs
brute-force ECDF, PSI vs a 10-line numpy reference, MMD vs direct Gram)."""

from __future__ import annotations

import numpy as np
import pytest

from al_drift_detection_spark.kernels import kolmogorov_sf, ks_2samp, mmd_rbf, psi, subsample

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
