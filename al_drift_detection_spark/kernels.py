"""Distribution-drift kernels: Kolmogorov-Smirnov, PSI, MMD-RBF (pure numpy).

These replace the reference's GAN-discriminator drift mechanism
(/root/reference/gan.py:723-860) with the statistical kernels named in
BASELINE.json north_star. Each kernel compares a *reference* sample against a
*current* window sample; sequential GAN state disappears — every
(reference, current) pair scores independently and embarrassingly parallel
(SURVEY.md §2.10 target mapping).

Pure numpy so they run vectorized inside Arrow-batched pandas UDFs (the only
place Python touches row data) and are unit-testable without Spark. No scipy
in the container, so the KS p-value uses the asymptotic Kolmogorov survival
function directly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ks_2samp", "kolmogorov_sf", "psi", "mmd_rbf", "subsample"]


def kolmogorov_sf(lam: float, terms: int = 101) -> float:
    """Kolmogorov distribution survival function Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}.

    Matches scipy.stats.kstwobign.sf; the standard asymptotic two-sided KS
    p-value (Press et al., Numerical Recipes §14.3). The alternating series
    converges slowly for small λ (a 101-term truncation leaves ~1e-9 error
    and even breaks monotonicity — caught by the hypothesis property test),
    so λ < 1 uses the Jacobi-theta dual form
    Q = 1 − (√(2π)/λ) Σ_{k≥1} e^{−(2k−1)²π²/(8λ²)}, which converges in a
    couple of terms there; the two branches agree to ~1e-15 at the switch.
    """
    if lam < 0.05:
        # Q(0.05) = 1 − √(2π)/λ·e^{−π²/(8λ²)} ≈ 1 − 1e−212: exactly 1.0 in
        # float64, and √(2π)/λ overflows for denormal λ — short-circuit
        return 1.0
    k = np.arange(1, terms, dtype=np.float64)
    if lam < 1.0:
        cdf = (np.sqrt(2.0 * np.pi) / lam) * np.sum(
            np.exp(-((2.0 * k - 1.0) ** 2) * np.pi**2 / (8.0 * lam**2))
        )
        s = 1.0 - cdf
    else:
        s = 2.0 * np.sum((-1.0) ** (k - 1) * np.exp(-2.0 * (k * lam) ** 2))
    return float(min(max(s, 0.0), 1.0))


def ks_2samp(ref: np.ndarray, cur: np.ndarray) -> tuple[float, float]:
    """Two-sample two-sided KS statistic + asymptotic p-value.

    D = sup_x |ECDF_ref(x) − ECDF_cur(x)| computed by merging the sorted
    samples; p = Q(λ) with λ = (√n_e + 0.12 + 0.11/√n_e)·D (NR correction),
    n_e = n·m/(n+m). Validated against a brute-force ECDF in tests.
    """
    ref = np.sort(np.asarray(ref, dtype=np.float64))
    cur = np.sort(np.asarray(cur, dtype=np.float64))
    n, m = len(ref), len(cur)
    if n == 0 or m == 0:
        return 0.0, 1.0
    both = np.concatenate([ref, cur])
    cdf_ref = np.searchsorted(ref, both, side="right") / n
    cdf_cur = np.searchsorted(cur, both, side="right") / m
    d = float(np.max(np.abs(cdf_ref - cdf_cur)))
    ne = np.sqrt(n * m / (n + m))
    lam = (ne + 0.12 + 0.11 / ne) * d
    return d, kolmogorov_sf(lam)


def psi(ref: np.ndarray, cur: np.ndarray, bins: int = 10, eps: float = 1e-4) -> float:
    """Population Stability Index with reference-quantile bins.

    Bin edges are the ref sample's quantiles (so each ref bin holds ~1/bins
    mass); PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) with eps-clipped
    proportions. Industry rule of thumb: <0.1 stable, >0.25 shifted.
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    if len(ref) == 0 or len(cur) == 0:
        return 0.0
    qs = np.quantile(ref, np.linspace(0.0, 1.0, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    qs = np.unique(qs)  # constant columns collapse bins
    if len(qs) <= 2:
        return 0.0
    p_ref = np.clip(np.histogram(ref, qs)[0] / len(ref), eps, None)
    p_cur = np.clip(np.histogram(cur, qs)[0] / len(cur), eps, None)
    p_ref, p_cur = p_ref / p_ref.sum(), p_cur / p_cur.sum()
    return float(np.sum((p_cur - p_ref) * np.log(p_cur / p_ref)))


def mmd_rbf(ref: np.ndarray, cur: np.ndarray, gamma: float | None = None, max_n: int = 1024) -> float:
    """Unbiased MMD² estimate with an RBF kernel, median-heuristic bandwidth.

    Samples are deterministically subsampled to max_n per side so the Gram
    matrices stay bounded (SURVEY.md §7 hard part (b)). Accepts 1-D (treated
    as a single feature) or 2-D (n, d) inputs.
    """
    X = np.asarray(ref, dtype=np.float64)
    Y = np.asarray(cur, dtype=np.float64)
    if X.ndim == 1:
        X = X[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]
    X, Y = subsample(X, max_n), subsample(Y, max_n)
    n, m = len(X), len(Y)
    if n < 2 or m < 2:
        return 0.0

    def sqdists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
        aa = np.sum(A * A, axis=1)[:, None]
        bb = np.sum(B * B, axis=1)[None, :]
        return np.maximum(aa + bb - 2.0 * (A @ B.T), 0.0)

    dxx, dyy, dxy = sqdists(X, X), sqdists(Y, Y), sqdists(X, Y)
    if gamma is None:
        med = np.median(dxy[dxy > 0]) if np.any(dxy > 0) else 1.0
        gamma = 1.0 / (2.0 * max(med, 1e-12))
    kxx, kyy, kxy = np.exp(-gamma * dxx), np.exp(-gamma * dyy), np.exp(-gamma * dxy)
    # unbiased: drop diagonals of the within-sample terms
    term_x = (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
    term_y = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
    return float(term_x + term_y - 2.0 * kxy.mean())


def subsample(x: np.ndarray, max_n: int) -> np.ndarray:
    """Deterministic even-stride subsample (stable under reruns — the
    determinism fix for the reference's per-run random seeding,
    /root/reference/gan.py:913)."""
    n = len(x)
    if n <= max_n:
        return x
    idx = np.linspace(0, n - 1, max_n).astype(np.int64)
    return x[idx]
