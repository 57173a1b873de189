"""Stateful streaming drift detection via applyInPandasWithState.

This is the closest Spark construct to the reference's sequential stateful
scan loop (/root/reference/gan.py:723-860): per-partition STATE carried
across micro-batches. The state is the bounded reference sample per column
(the analog of the reference's accepted-drift training segments,
gan.py:826-836, with M2's bounded-memory eviction replaced by a fixed-size
even-stride subsample); each micro-batch's rows are scored against the state
with the KS kernel, then FOLDED INTO the state when they pass (the analog of
"no drift → extend the current segment"), or flagged and kept OUT of the
state when they fail (the analog of "drift → new segment").

GroupStateTimeout is not used: late partitions simply deliver more batches —
idempotent accumulation, no watermark aborts (contrast the reference's
500k-row no-drift abort, gan.py:744-747).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from al_drift_detection_spark.kernels import ks_2samp, subsample

OUT_SCHEMA = (
    "part int, batch_rows long, column string, statistic double, p_value double, "
    "verdict string, state_rows long"
)
# state: one row per tracked column — the reference sample as a double array
STATE_SCHEMA = "cols array<string>, samples array<array<double>>"

MAX_STATE = 4096


def stateful_drift(
    stream_df: DataFrame,
    value_cols: list[str],
    part_col: str = "part",
    ks_alpha: float = 0.01,
    min_ref: int = 200,
) -> DataFrame:
    """Per-partition streaming drift scores with carried reference state.

    Input must be a streaming DataFrame containing part_col + value_cols.
    Output: one row per (micro-batch, partition, column).
    """

    def fn(key, pdfs, state: GroupState):
        # NULL keys arrive as NaN; report them as NULL instead of crashing
        part = int(key[0]) if pd.notna(key[0]) else None
        batches = list(pdfs)
        pdf = pd.concat(batches) if len(batches) > 1 else batches[0]

        if state.exists:
            (cols, samples) = state.get
            ref = {c: np.asarray(s, dtype=np.float64) for c, s in zip(cols, samples)}
        else:
            ref = {c: np.empty(0) for c in value_cols}

        rows = []
        new_ref = {}
        for c in value_cols:
            cur = pdf[c].dropna().to_numpy(dtype=np.float64)
            r = ref.get(c, np.empty(0))
            if len(r) < min_ref:
                # bootstrap phase: absorb silently (analog of the reference's
                # pre-train on known segments, gan.py:679-704)
                verdict, d, p = "bootstrap", 0.0, 1.0
                merged = np.concatenate([r, cur])
            else:
                d, p = ks_2samp(r, cur)
                if p < ks_alpha:
                    verdict = "fail"
                    merged = r  # drifted rows do NOT contaminate the reference
                else:
                    verdict = "pass"
                    merged = np.concatenate([r, cur])
            new_ref[c] = subsample(np.sort(merged), MAX_STATE)
            rows.append(
                (part, len(pdf), c, float(d), float(p), verdict, len(new_ref[c]))
            )

        state.update((list(value_cols), [new_ref[c].tolist() for c in value_cols]))
        yield pd.DataFrame(
            rows,
            columns=[
                "part", "batch_rows", "column", "statistic", "p_value",
                "verdict", "state_rows",
            ],
        )

    return (
        stream_df.groupBy(part_col)
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
