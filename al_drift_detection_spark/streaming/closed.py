"""CLOSED-WINDOW streaming verdicts (VERDICT r4 item 5): event-time windows
whose verdict is emitted ONCE, when the watermark passes the window end —
never per micro-batch fragment.

stream_cat_drift / stream_health score each micro-batch's fragment of a
window independently (documented caveat in streaming/validate.py): a window
straddling two batches gets two partial verdicts that never reconcile. The
reference's detector only votes when a window CLOSES (gan.py:737-757 — it
never emits on a partial window). These operators reproduce that contract
with applyInPandasWithState + EventTimeTimeout:

- group key = the tumbling event-time window (start, end) of ts_col;
- per batch, the fragment is REDUCED to mergeable partials (row/null counts,
  bounded category counts) and folded into the group state — state is O(1)
  per window regardless of fragment sizes, and no verdict is emitted;
- when the watermark passes window_end (+ the watermark delay), the timeout
  fires exactly once: the verdict over the window's ENTIRE row set is
  emitted and the state removed. A window split across any number of
  micro-batches therefore yields ONE verdict, byte-equal to the batch
  operator on the same rows (parity pinned in tests/test_closed_windows.py).

The category universe / reference rules are the deterministic ones of
drift.categorical_drift and functions/health (fixed ref literals), so a
window's verdict never depends on other windows or batch boundaries. Rows
arriving later than the watermark can re-open a window and produce a second
(fragment-only) verdict at its next close — the standard watermark
trade-off; size the delay for the source's lateness.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from al_drift_detection_spark.kernels import chi2_sf, ks_2samp, mmd_rbf, psi, subsample

CAT_OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, n long, chi2_stat double, "
    "dof long, p_value double, verdict string"
)
CAT_STATE_SCHEMA = "counts array<long>"

HEALTH_OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, check string, column string, "
    "n_rows long, metric double, ref double, verdict string"
)
HEALTH_STATE_SCHEMA = "n long, nulls array<long>"


def _windowed(stream_df: DataFrame, ts_col: str, window: str, watermark: str):
    """Watermarked frame with the tumbling window's (start, end) as columns —
    the group key for the stateful close. Parquet NTZ timestamps are cast
    (session TZ pinned UTC, values unchanged — streaming_window_stats
    convention)."""
    d = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return d.withWatermark(ts_col, watermark).withColumn(
        "_w", F.window(F.col(ts_col), window)
    ).withColumn("_w_start", F.col("_w.start")).withColumn("_w_end", F.col("_w.end"))


def closed_cat_drift(
    stream_df: DataFrame,
    ts_col: str,
    cat_col: str,
    ref_props: dict[str, float],
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    alpha: float = 0.01,
    eps: float = 1e-6,
) -> DataFrame:
    """Closed-window chi-square categorical drift: the streaming twin of
    drift.categorical_drift with window-close emission. Same deterministic
    universe (ref_props keys + '(other)' catch-all, NULL → '(null)'), same
    normalization and statistic; one output row per closed window."""
    if not ref_props:
        raise ValueError("ref_props is empty — no reference distribution to test against")
    if "(other)" in ref_props:
        raise ValueError('"(other)" is the reserved catch-all bucket name')
    raw = {str(c): max(float(p), eps) for c, p in ref_props.items()}
    raw["(other)"] = eps
    z = sum(raw.values())
    cats = sorted(raw)
    ps = [raw[c] / z for c in cats]
    idx = {c: i for i, c in enumerate(cats)}
    dof = len(cats) - 1

    def fn(key, pdfs, state: GroupState):
        w_start, w_end = key[0], key[1]
        if state.hasTimedOut:
            (counts,) = state.get
            n = int(sum(counts))
            stat = sum(
                (counts[i] - n * ps[i]) ** 2 / (n * ps[i]) for i in range(len(cats))
            )
            p = chi2_sf(float(stat), dof) if dof > 0 else 1.0
            state.remove()
            yield pd.DataFrame(
                [(w_start, w_end, n, float(stat), dof, float(p),
                  "fail" if p < alpha else "pass")],
                columns=["window_start", "window_end", "n", "chi2_stat",
                         "dof", "p_value", "verdict"],
            )
            return
        counts = list(state.get[0]) if state.exists else [0] * len(cats)
        for pdf in pdfs:
            # _cat is already Spark-cast to string + null-coalesced JVM-side
            # (below) — a Python str(v) here would diverge from the batch
            # operator's cast for boolean/float categoricals ('True' vs
            # 'true', '1e-07' vs '1.0E-7') and dump every row into the eps
            # catch-all (review-caught batch≢closed divergence)
            for v in pdf["_cat"]:
                counts[idx.get(v, idx["(other)"])] += 1
        state.update((counts,))
        # close when the watermark passes the window end (the watermark
        # already carries the lateness allowance); a LATE fragment re-opening
        # an already-closed window would find watermark ≥ window_end, where a
        # past timeout is rejected — clamp just above the watermark
        state.setTimeoutTimestamp(
            max(int(w_end.timestamp() * 1000), state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — generator form

    win = _windowed(stream_df, ts_col, window, watermark)
    return (
        # the watermarked ts column must stay in the grouped frame — event-
        # time timeout requires the watermark to be visible at the stateful
        # node, and projecting ts away severs it (AnalysisException). The
        # category is cast/coalesced with the SAME Spark expressions as the
        # batch operator so the two bucket identically for every input type.
        win.select(
            "_w_start", "_w_end", ts_col,
            F.coalesce(F.col(cat_col).cast("string"), F.lit("(null)")).alias("_cat"),
        )
        .groupBy("_w_start", "_w_end")
        .applyInPandasWithState(
            fn, CAT_OUT_SCHEMA, CAT_STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def closed_window_health(
    stream_df: DataFrame,
    ts_col: str,
    ref_volume: float,
    ref_null_ratios: dict[str, float],
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    low: float = 0.5,
    high: float = 2.0,
    threshold: float = 0.05,
) -> DataFrame:
    """Closed-window volume + completeness verdicts: the streaming twin of
    health.volume_anomaly / completeness_drift (fixed references — the
    deterministic-reference rule) with window-close emission. Output is
    long-format: one 'volume' row plus one 'completeness' row per tracked
    column per closed window, values rounded exactly like the batch ops."""
    if not ref_volume > 0:
        raise ValueError(
            f"ref_volume must be positive, got {ref_volume} — a zero "
            "reference would either crash at window close or pass every "
            "window with a NULL ratio"
        )
    cols = list(ref_null_ratios)

    def fn(key, pdfs, state: GroupState):
        w_start, w_end = key[0], key[1]
        if state.hasTimedOut:
            n, nulls = state.get
            n = int(n)
            rows = [(
                w_start, w_end, "volume", None, n,
                round(n / ref_volume, 6), round(float(ref_volume), 6),
                "fail" if (n / ref_volume < low or n / ref_volume > high) else "pass",
            )]
            for i, c in enumerate(cols):
                ratio = nulls[i] / n if n else 0.0
                ref = float(ref_null_ratios[c])
                rows.append((
                    w_start, w_end, "completeness", c, n,
                    round(ratio, 6), round(ref, 6),
                    "fail" if ratio - ref > threshold else "pass",
                ))
            state.remove()
            yield pd.DataFrame(
                rows,
                columns=["window_start", "window_end", "check", "column",
                         "n_rows", "metric", "ref", "verdict"],
            )
            return
        n, nulls = (int(state.get[0]), list(state.get[1])) if state.exists else (0, [0] * len(cols))
        for pdf in pdfs:
            n += len(pdf)
            for i, c in enumerate(cols):
                nulls[i] += int(pdf[c].isna().sum())
        state.update((n, nulls))
        # same late-fragment clamp as closed_cat_drift
        state.setTimeoutTimestamp(
            max(int(w_end.timestamp() * 1000), state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — generator form

    win = _windowed(stream_df, ts_col, window, watermark)
    return (
        # keep the watermarked ts column visible (same as closed_cat_drift)
        win.select("_w_start", "_w_end", ts_col, *cols)
        .groupBy("_w_start", "_w_end")
        .applyInPandasWithState(
            fn, HEALTH_OUT_SCHEMA, HEALTH_STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


DRIFT_OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, n_rows long, column string, "
    "kernel string, statistic double, p_value double, threshold double, "
    "verdict string"
)
DRIFT_STATE_SCHEMA = "n long, cols array<string>, samples array<array<double>>"


def closed_drift_scores(
    stream_df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    ref_samples: dict,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ks_alpha: float = 0.01,
    psi_threshold: float = 0.25,
    mmd_threshold: float = 0.05,
    max_n: int = 2048,
    mmd_max_n: int = 512,
) -> DataFrame:
    """Closed-window KS/PSI/MMD drift: the streaming twin of
    drift.drift_scores with window-close emission — the core north_star
    kernel trio, scored once per event-time window against the broadcast
    reference when the watermark passes the window end (the reference's
    window-close vote, gan.py:737-757: it never votes on a partial window).

    State per (window, column) is a BOUNDED sample: fragments accumulate up
    to 2·max_n values, above which the merged sorted sample collapses to its
    even-stride grid (the stateful_drift.py precedent) — the kernels
    subsample to max_n per side anyway, so the collapse costs no detection
    power. Windows that fit under the cap score on their exact row multiset,
    so their verdicts equal drift_scores on the same rows (split-window
    parity pinned in tests/test_closed_windows.py); n_rows always reports
    the window's TRUE size. Output: one row per (window, column, kernel) +
    the per-column 2-of-3 majority 'vote' row, exactly drift_scores'
    contract keyed by window bounds.
    """
    import numpy as np

    ref = {c: np.asarray(ref_samples[c], dtype=np.float64) for c in value_cols}
    state_cap = 2 * max_n

    def fn(key, pdfs, state: GroupState):
        w_start, w_end = key[0], key[1]
        if state.hasTimedOut:
            n, cols, samples = state.get
            cur_by_col = {
                c: np.asarray(s, dtype=np.float64) for c, s in zip(cols, samples)
            }
            rows = []
            for c in value_cols:
                cur = subsample(cur_by_col.get(c, np.empty(0)), max_n)
                r = ref[c]
                d, p = ks_2samp(r, cur)
                psi_v = psi(r, cur)
                mmd_v = mmd_rbf(r, cur, max_n=mmd_max_n)
                flags = [p < ks_alpha, psi_v > psi_threshold, mmd_v > mmd_threshold]
                rows += [
                    (w_start, w_end, int(n), c, "ks", d, p, ks_alpha,
                     "fail" if flags[0] else "pass"),
                    (w_start, w_end, int(n), c, "psi", psi_v, None, psi_threshold,
                     "fail" if flags[1] else "pass"),
                    (w_start, w_end, int(n), c, "mmd_rbf", mmd_v, None, mmd_threshold,
                     "fail" if flags[2] else "pass"),
                    (w_start, w_end, int(n), c, "vote", float(sum(flags)), None, 2.0,
                     "fail" if sum(flags) >= 2 else "pass"),
                ]
            state.remove()
            yield pd.DataFrame(
                rows,
                columns=["window_start", "window_end", "n_rows", "column",
                         "kernel", "statistic", "p_value", "threshold", "verdict"],
            )
            return
        if state.exists:
            n, cols, samples = state.get
            acc = {c: list(s) for c, s in zip(cols, samples)}
            n = int(n)
        else:
            n, acc = 0, {c: [] for c in value_cols}
        import numpy as _np

        for pdf in pdfs:
            n += len(pdf)
            for c in value_cols:
                vals = pdf[c].dropna().to_numpy(dtype=float)
                merged = _np.concatenate([_np.asarray(acc[c], dtype=float), vals])
                if len(merged) > state_cap:
                    merged = subsample(_np.sort(merged), state_cap)
                acc[c] = merged.tolist()
        state.update((n, list(value_cols), [acc[c] for c in value_cols]))
        state.setTimeoutTimestamp(
            max(int(w_end.timestamp() * 1000), state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — generator form

    win = _windowed(stream_df, ts_col, window, watermark)
    return (
        # keep the watermarked ts column visible (same as closed_cat_drift)
        win.select("_w_start", "_w_end", ts_col, *value_cols)
        .groupBy("_w_start", "_w_end")
        .applyInPandasWithState(
            fn, DRIFT_OUT_SCHEMA, DRIFT_STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


UNIQ_OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, n_rows long, "
    "n_distinct long, ratio double, ref_ratio double, verdict string"
)
UNIQ_STATE_SCHEMA = "n long, kmv array<double>"


def closed_window_uniqueness(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    ref_ratio: float,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    threshold: float = 0.05,
    k: int = 4096,
) -> DataFrame:
    """Closed-window UNIQUENESS (distinct-ratio duplicate-surge alarm): the
    streaming twin of health.uniqueness_drift with window-close emission,
    completing the closed family (volume / completeness / cat-drift /
    KS-PSI-MMD / uniqueness).

    State per window is a K-MINIMUM-VALUES sketch — the k smallest
    normalized key hashes — which is MERGEABLE across fragments (union,
    keep k smallest) and bounded at k doubles no matter how many rows
    streamed by (HLL would also merge, but KMV keeps the under-k case
    EXACT: a window with fewer than k distinct keys reports its exact
    distinct count, so small-window verdicts equal uniqueness_drift's
    approx=False form; over-k windows use the standard (k−1)/m_k estimator,
    relative error ≈ 1/√(k−2) ≈ 1.6% at the default k). The key hash is
    computed JVM-side (xxhash64 → uniform [0,1)) so only (ts, hash) columns
    reach the Python state — the key bytes themselves never do. The
    threshold-vs-sketch-noise rule mirrors uniqueness_drift: threshold must
    clear 3/√(k−2).

    Output mirrors uniqueness_drift: fail iff ref_ratio − ratio > threshold
    (one-sided — uniqueness DROPPING).
    """
    import numpy as np

    if not 0.0 < ref_ratio <= 1.0:
        raise ValueError(f"ref_ratio must be in (0, 1], got {ref_ratio}")
    rel_err = 1.0 / max(k - 2, 1) ** 0.5
    if threshold < 3.0 * rel_err:
        raise ValueError(
            f"closed_window_uniqueness: threshold {threshold} is inside the "
            f"KMV noise band (k={k} → rel err ≈ {rel_err:.4f}; need "
            f"threshold ≥ {3.0 * rel_err:.4f}); raise k or the threshold"
        )

    def fn(key, pdfs, state: GroupState):
        w_start, w_end = key[0], key[1]
        if state.hasTimedOut:
            n, kmv = state.get
            n = int(n)
            kmv = np.asarray(kmv, dtype=np.float64)
            if len(kmv) < k:
                n_distinct = len(kmv)  # exact: every distinct hash retained
            else:
                # clamp the estimator to n: its ~1/√(k−2) noise could
                # otherwise report n_distinct > n_rows / ratio > 1.0 — an
                # impossible value under the batch contract (review-caught)
                n_distinct = min(int(round((k - 1) / float(kmv.max()))), n)
            ratio = n_distinct / n if n else 0.0
            state.remove()
            yield pd.DataFrame(
                [(w_start, w_end, n, n_distinct, round(ratio, 6),
                  round(float(ref_ratio), 6),
                  "fail" if ref_ratio - ratio > threshold else "pass")],
                columns=["window_start", "window_end", "n_rows", "n_distinct",
                         "ratio", "ref_ratio", "verdict"],
            )
            return
        if state.exists:
            n, kmv = int(state.get[0]), np.asarray(state.get[1], dtype=np.float64)
        else:
            n, kmv = 0, np.empty(0)
        for pdf in pdfs:
            n += len(pdf)
            h = pdf["_h"].dropna().to_numpy(dtype=np.float64)
            kmv = np.unique(np.concatenate([kmv, h]))  # sorted distinct
            if len(kmv) > k:
                kmv = kmv[:k]  # keep the k SMALLEST
        state.update((n, kmv.tolist()))
        state.setTimeoutTimestamp(
            max(int(w_end.timestamp() * 1000), state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — generator form

    win = _windowed(stream_df, ts_col, window, watermark)
    # xxhash64 is a signed long; shift to uniform [0, 1) JVM-side — only the
    # hash crosses into Python state, never the key bytes. NULL keys must map
    # to a NULL hash explicitly: xxhash64(NULL) returns the SEED (never
    # NULL), which would count all null-key rows as one extra distinct key —
    # the batch twin's count_distinct excludes NULLs (review-caught parity
    # break; n_rows still counts every row, matching the batch count(1))
    h = F.when(
        F.col(key_col).isNotNull(),
        (F.xxhash64(F.col(key_col)).cast("double") / F.lit(float(1 << 64))) + F.lit(0.5),
    )
    return (
        win.select("_w_start", "_w_end", ts_col, h.alias("_h"))
        .groupBy("_w_start", "_w_end")
        .applyInPandasWithState(
            fn, UNIQ_OUT_SCHEMA, UNIQ_STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
