"""Distribution-drift kernels (pure numpy): Kolmogorov-Smirnov, PSI, MMD-RBF,
chi-square homogeneity (+ incomplete-gamma SF), Jensen-Shannon, Wasserstein-1.

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

__all__ = [
    "ks_2samp",
    "kolmogorov_sf",
    "psi",
    "mmd_rbf",
    "subsample",
    "chi2_sf",
    "chi2_2samp",
    "js_divergence",
    "wasserstein_1d",
    "hist_distances",
    "cusum_2sided",
]


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


def _sqdists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    aa = np.sum(A * A, axis=1)[:, None]
    bb = np.sum(B * B, axis=1)[None, :]
    return np.maximum(aa + bb - 2.0 * (A @ B.T), 0.0)


def mmd_ref_state(ref: np.ndarray, max_n: int = 1024) -> tuple:
    """Precompute mmd_rbf's reference-side work — the subsampled sample
    matrix and its within-sample squared-distance block, which are
    IDENTICAL for every window scored against the same reference (r8:
    drift_scores was recomputing the ref×ref block per window — the
    largest of the three Gram-input matrices). Pass the returned state as
    mmd_rbf(ref_state=...); the arithmetic is the exact same code path, so
    results are bit-identical (pinned in tests/test_kernels.py)."""
    X = np.asarray(ref, dtype=np.float64)
    if X.ndim == 1:
        X = X[:, None]
    X = subsample(X, max_n)
    return (X, _sqdists(X, X))


def mmd_rbf(
    ref: np.ndarray | None,
    cur: np.ndarray,
    gamma: float | None = None,
    max_n: int = 1024,
    ref_state: tuple | None = None,
) -> float:
    """Unbiased MMD² estimate with an RBF kernel, median-heuristic bandwidth.

    Samples are deterministically subsampled to max_n per side so the Gram
    matrices stay bounded (SURVEY.md §7 hard part (b)). Accepts 1-D (treated
    as a single feature) or 2-D (n, d) inputs. ref_state (mmd_ref_state)
    supplies the reference side precomputed when many windows score against
    one fixed reference; `ref` is ignored then.
    """
    if ref_state is not None:
        X, dxx = ref_state
    else:
        X = np.asarray(ref, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        X = subsample(X, max_n)
    Y = np.asarray(cur, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    Y = subsample(Y, max_n)
    n, m = len(X), len(Y)
    if n < 2 or m < 2:
        return 0.0

    if ref_state is None:
        dxx = _sqdists(X, X)
    dyy, dxy = _sqdists(Y, Y), _sqdists(X, Y)
    if gamma is None:
        med = np.median(dxy[dxy > 0]) if np.any(dxy > 0) else 1.0
        gamma = 1.0 / (2.0 * max(med, 1e-12))
    kxx, kyy, kxy = np.exp(-gamma * dxx), np.exp(-gamma * dyy), np.exp(-gamma * dxy)
    # unbiased: drop diagonals of the within-sample terms
    term_x = (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
    term_y = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
    return float(term_x + term_y - 2.0 * kxy.mean())


def chi2_sf(x: float, k: int) -> float:
    """Chi-square survival function P(X ≥ x) for k degrees of freedom.

    Q(k/2, x/2) — the regularized UPPER incomplete gamma function, computed
    with the standard Numerical Recipes §6.2 pair (no scipy in the container,
    same situation as kolmogorov_sf): the series form of P(a,x) for x < a+1,
    the Lentz continued fraction of Q(a,x) otherwise. Golden-value tested
    against the classic chi-square table (e.g. Q(3.841;1) ≈ 0.05) and a
    hypothesis monotonicity property.
    """
    # the second clause catches subnormal x where 0.5*x underflows to exactly
    # 0.0: the series path would then take log(0) = -inf (a numpy
    # RuntimeWarning inside executor pandas UDFs) before exp() correctly
    # collapses it to p=0 → Q=1.0 — return that 1.0 directly, warning-free
    if x <= 0.0 or 0.5 * x == 0.0:
        return 1.0
    if k <= 0:
        raise ValueError(f"chi2_sf: dof must be positive, got {k}")
    a, xx = 0.5 * k, 0.5 * x
    lg = _lgamma(a)
    if xx < a + 1.0:
        # series for the lower P(a,x); Q = 1 - P
        ap, s, d = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            d *= xx / ap
            s += d
            if abs(d) < abs(s) * 1e-15:
                break
        p = s * np.exp(-xx + a * np.log(xx) - lg)
        return float(min(max(1.0 - p, 0.0), 1.0))
    # modified-Lentz continued fraction for Q(a,x) directly
    tiny = 1e-300
    b, c, d = xx + 1.0 - a, 1.0 / tiny, 1.0 / (xx + 1.0 - a)
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = h * np.exp(-xx + a * np.log(xx) - lg)
    return float(min(max(q, 0.0), 1.0))


def _lgamma(a: float) -> float:
    """log Γ(a) — Lanczos g=7 n=9 (double-precision standard coefficients)."""
    g = 7
    coef = np.array(
        [
            0.99999999999980993,
            676.5203681218851,
            -1259.1392167224028,
            771.32342877765313,
            -176.61502916214059,
            12.507343278686905,
            -0.13857109526572012,
            9.9843695780195716e-6,
            1.5056327351493116e-7,
        ]
    )
    if a < 0.5:
        # reflection; not hit for chi-square (a = k/2 ≥ 0.5) but keep it total
        return float(np.log(np.pi / np.sin(np.pi * a)) - _lgamma(1.0 - a))
    a -= 1.0
    x = coef[0] + np.sum(coef[1:] / (a + np.arange(1, g + 2)))
    t = a + g + 0.5
    return float(0.5 * np.log(2.0 * np.pi) + (a + 0.5) * np.log(t) - t + np.log(x))


def chi2_2samp(ref_cats: np.ndarray, cur_cats: np.ndarray) -> tuple[float, int, float]:
    """Chi-square homogeneity test between two categorical samples.

    Builds the 2×K contingency table over the UNION of observed categories,
    stat = Σ (o − e)²/e with e = row_total·col_total/grand_total (zero
    observed cells still contribute their expected mass — the classic
    mistake relational ports make is summing only observed cells), dof =
    K − 1, p = chi2_sf(stat, dof). Returns (stat, dof, p).

    Replaces the reference's single-distribution drift alarm for CATEGORICAL
    columns (fmt, lang) where KS on ranks is ill-defined; north_star names
    the fmt-whitelist/shift check. Oracle twin: q_chi2_drift.
    """
    ref_cats = np.asarray(ref_cats)
    cur_cats = np.asarray(cur_cats)
    if len(ref_cats) == 0 or len(cur_cats) == 0:
        return 0.0, 0, 1.0
    cats = np.unique(np.concatenate([ref_cats, cur_cats]))
    if len(cats) < 2:
        return 0.0, 0, 1.0
    o_r = np.array([(ref_cats == c).sum() for c in cats], dtype=np.float64)
    o_c = np.array([(cur_cats == c).sum() for c in cats], dtype=np.float64)
    col = o_r + o_c
    tot = col.sum()
    e_r = len(ref_cats) * col / tot
    e_c = len(cur_cats) * col / tot
    stat = float(np.sum((o_r - e_r) ** 2 / e_r) + np.sum((o_c - e_c) ** 2 / e_c))
    dof = len(cats) - 1
    return stat, dof, chi2_sf(stat, dof)


def js_divergence(ref: np.ndarray, cur: np.ndarray, bins: int = 10) -> float:
    """Jensen-Shannon divergence (natural log, so ∈ [0, ln 2]) between the two
    samples' histograms on reference-quantile bins (same binning policy as
    psi(); JS is the bounded/symmetric alternative when PSI's log-ratio blows
    up on near-empty bins). Zero bins contribute exactly 0 — no eps clipping
    needed because m = (p+q)/2 > 0 wherever p > 0 or q > 0.
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    if len(ref) == 0 or len(cur) == 0:
        return 0.0
    qs = np.quantile(ref, np.linspace(0.0, 1.0, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    qs = np.unique(qs)
    if len(qs) <= 2:
        return 0.0
    p = np.histogram(ref, qs)[0] / len(ref)
    q = np.histogram(cur, qs)[0] / len(cur)
    m = 0.5 * (p + q)
    with np.errstate(divide="ignore", invalid="ignore"):
        kl_pm = np.where(p > 0, p * np.log(p / m), 0.0)
        kl_qm = np.where(q > 0, q * np.log(q / m), 0.0)
    return float(0.5 * kl_pm.sum() + 0.5 * kl_qm.sum())


def wasserstein_1d(ref: np.ndarray, cur: np.ndarray) -> float:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between the two
    empirical distributions: ∫ |ECDF_ref − ECDF_cur| dx over the merged
    support. Unlike KS (sup-norm) this is mass-weighted — a small shift of
    the whole distribution scores ∝ the shift, the property the drift-regime
    catalog wants for "how far", not just "is different". Matches
    mean|sorted_ref − sorted_cur| when n == m (tested). Oracle twin:
    q_wasserstein.
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    if len(ref) == 0 or len(cur) == 0:
        return 0.0
    all_v = np.sort(np.concatenate([ref, cur]))
    deltas = np.diff(all_v)
    cdf_r = np.searchsorted(np.sort(ref), all_v[:-1], side="right") / len(ref)
    cdf_c = np.searchsorted(np.sort(cur), all_v[:-1], side="right") / len(cur)
    return float(np.sum(np.abs(cdf_r - cdf_c) * deltas))


def cvm_2samp(ref: np.ndarray, cur: np.ndarray) -> float:
    """Two-sample Cramér–von Mises criterion T (Anderson 1962) in its ECDF
    form: T = (n·m/N²) · Σ_z (F_ref(z) − F_cur(z))² summed over ALL N = n+m
    combined observations z (with multiplicity; ECDFs right-continuous, so
    ties contribute the shared post-tie ECDF value — the same convention the
    relational distinct-value pre-agg produces). Equals the classic
    rank-based U/(n·m·N) − (4mn−1)/(6N) on tie-free data (pytest-pinned).
    CvM integrates the SQUARED ECDF gap over the combined sample — the
    whole-distribution companion to KS's single sup-norm point, more
    sensitive to broad small shifts. Oracle twin: q_cvm_drift.
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    n, m = len(ref), len(cur)
    if n == 0 or m == 0:
        return 0.0
    z = np.concatenate([ref, cur])
    fr = np.searchsorted(np.sort(ref), z, side="right") / n
    fc = np.searchsorted(np.sort(cur), z, side="right") / m
    return float(n * m / (n + m) ** 2 * np.sum((fr - fc) ** 2))


def ad_2samp(ref: np.ndarray, cur: np.ndarray) -> float:
    """Two-sample Anderson-Darling statistic A²akN (Scholz & Stephens 1987,
    k=2, TIE-ADJUSTED midrank version): over the L distinct pooled values
    with multiplicities l_j, half-step cumulatives B_aj = B_{j−1} + l_j/2
    (pooled) and M_aij likewise per sample,

        A² = (N−1)/N · Σ_i (1/n_i) Σ_j (l_j/N) (N·M_aij − n_i·B_aj)²
                                     / (B_aj (N − B_aj) − N l_j / 4)

    — the EDF test that up-weights the TAILS, completing the trio with KS
    (sup point) and CvM (integrated squared gap). E[A²] ≈ k−1 = 1 under the
    null; pytest pins closeness to the independent continuous Pettitt
    M_j-rank formula on tie-free data (the midrank adjustment is an O(1/N)
    perturbation there) plus null/shift behavior. Oracle twin: q_ad_drift.
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    n, m = len(ref), len(cur)
    N = n + m
    if n == 0 or m == 0:
        return 0.0
    vals, l = np.unique(np.concatenate([ref, cur]), return_counts=True)
    lr = np.searchsorted(np.sort(ref), vals, side="right") - np.searchsorted(
        np.sort(ref), vals, side="left"
    )
    lc = l - lr
    B = np.cumsum(l) - l / 2.0
    Mr = np.cumsum(lr) - lr / 2.0
    Mc = np.cumsum(lc) - lc / 2.0
    denom = B * (N - B) - N * l / 4.0
    ok = denom > 0  # the all-ties single-value edge contributes nothing
    inner = (l / N) * (
        (N * Mr - n * B) ** 2 / n + (N * Mc - m * B) ** 2 / m
    )
    return float((N - 1) / N * np.sum(inner[ok] / denom[ok]))


def energy_distance(ref: np.ndarray, cur: np.ndarray) -> float:
    """Squared energy distance (Székely–Rizzo) between two samples, the
    V-statistic form: D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| with each expectation
    the mean over ALL n² ordered pairs (diagonal zeros included — the plain
    cross-join mean, which is what the relational twin computes). Works on
    1-D or multivariate rows (axis 0 = samples); Euclidean metric. The
    distance-based multivariate two-sample statistic that needs NO kernel
    bandwidth choice — the tuning-free companion to mmd_rbf for embedding
    drift. Oracle twin: q_energy_distance.
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    if ref.ndim == 1:
        ref = ref[:, None]
    if cur.ndim == 1:
        cur = cur[:, None]
    if ref.shape[0] == 0 or cur.shape[0] == 0:
        return 0.0

    def mean_dist(a: np.ndarray, b: np.ndarray) -> float:
        d2 = (
            np.sum(a * a, axis=1)[:, None]
            + np.sum(b * b, axis=1)[None, :]
            - 2.0 * (a @ b.T)
        )
        return float(np.mean(np.sqrt(np.maximum(d2, 0.0))))

    return 2.0 * mean_dist(ref, cur) - mean_dist(ref, ref) - mean_dist(cur, cur)


def hist_distances(
    ref: np.ndarray, cur: np.ndarray, bins: int = 10
) -> tuple[float, float, float]:
    """Bounded histogram distances between the two samples on
    reference-quantile bins (same binning policy as psi()/js_divergence):
    Hellinger distance H = √(½ Σ (√p_i − √q_i)²) ∈ [0, 1], total-variation
    distance TV = ½ Σ |p_i − q_i| ∈ [0, 1], and the Bhattacharyya overlap
    coefficient BC = Σ √(p_i q_i) ∈ [0, 1] (H² = 1 − BC). These complete the
    drift-kernel family's bounded end: PSI is unbounded and needs eps
    clipping on empty bins; H/TV/BC have no log-ratio singularity, so a bin
    empty on one side contributes its full mass loss and nothing blows up —
    the right default for monitoring dashboards with fixed [0,1] axes.
    Returns (hellinger, total_variation, bhattacharyya). Empty input →
    (0, 0, 1) (no evidence of drift); a constant reference keeps its two
    open-tail bins (same policy as psi/js_divergence), so a spread current
    sample still registers as drifted.
    Oracle twin: q_hist_distances (fixed-bin relational form).
    """
    ref = np.asarray(ref, dtype=np.float64)
    cur = np.asarray(cur, dtype=np.float64)
    if len(ref) == 0 or len(cur) == 0:
        return 0.0, 0.0, 1.0
    qs = np.quantile(ref, np.linspace(0.0, 1.0, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    qs = np.unique(qs)
    if len(qs) <= 2:
        return 0.0, 0.0, 1.0
    p = np.histogram(ref, qs)[0] / len(ref)
    q = np.histogram(cur, qs)[0] / len(cur)
    hell = float(np.sqrt(0.5 * np.sum((np.sqrt(p) - np.sqrt(q)) ** 2)))
    tv = float(0.5 * np.sum(np.abs(p - q)))
    bc = float(np.sum(np.sqrt(p * q)))
    return hell, tv, bc


def cusum_2sided(
    xs: np.ndarray, mu: float, k: float
) -> tuple[np.ndarray, np.ndarray]:
    """Two-sided tabular CUSUM (Page 1954): S⁺_t = max(0, S⁺_{t−1} + x_t − μ₀ − k)
    watches for a sustained mean INCREASE past the in-control level μ₀ with
    slack k (conventionally ½ the shift worth detecting, in the series'
    units); S⁻_t symmetric for a decrease. Computed in the closed prefix
    form S_t = C_t − min(0, min_{j≤t} C_j) over the cumulative deviation
    series C — identical to the recursion (tested) and the exact construction
    the relational twin runs as two ordered windows, so both paths produce
    the same doubles. Complements Page-Hinkley (changepoint.page_hinkley):
    CUSUM tests against a KNOWN in-control baseline (the reference windows),
    PH against the series' own running mean. Returns (s_inc, s_dec) arrays.
    Oracle twin: q_cusum.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ci = np.cumsum(xs - mu - k)
    cd = np.cumsum(mu - xs - k)
    s_inc = ci - np.minimum(np.minimum.accumulate(ci), 0.0)
    s_dec = cd - np.minimum(np.minimum.accumulate(cd), 0.0)
    return s_inc, s_dec


def subsample(x: np.ndarray, max_n: int) -> np.ndarray:
    """Deterministic even-stride subsample (stable under reruns — the
    determinism fix for the reference's per-run random seeding,
    /root/reference/gan.py:913)."""
    n = len(x)
    if n <= max_n:
        return x
    idx = np.linspace(0, n - 1, max_n).astype(np.int64)
    return x[idx]
