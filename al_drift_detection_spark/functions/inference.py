"""Batch inference as dataflow: the reference's CRNN predict pattern
(/root/reference/cnn.py:221-236, 296-298 — model.predict over batches →
argmax → LABEL_PRED column) preserved as a mapInPandas example (SURVEY.md
§2.11): a frozen linear model scores embedding vectors one numpy matmul per
Arrow batch, emitting `label_pred` that feeds the existing metric block
(A6-A10: confusion matrix → accuracy/PRF/S-D-I).

The model is a deterministic WEIGHT FORMULA (not learned): W[c][d] and b[c]
derive from integer arithmetic so the exact same constants can be embedded in
a DuckDB oracle (list_dot_product + ordered CASE argmax) — scoring is
oracle-checked end to end, which a real checkpoint file could never be.

Scale shape: mapInPandas is a pure map — no shuffle; the weight matrix is a
closure constant regenerated per executor (no driver shipping); per-batch
cost is one (batch × dim) @ (dim × classes) GEMM.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def linear_model(n_classes: int = 10, dim: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Frozen deterministic weights: W[c, d] = ((c·61 + d·17) mod 7 − 3)/3,
    b[c] = ((c·13) mod 9 − 4)/10. Integer-derived so Spark and the SQL oracle
    agree bit-for-bit on the literals."""
    c = np.arange(n_classes)[:, None]
    d = np.arange(dim)[None, :]
    W = (((c * 61 + d * 17) % 7) - 3) / 3.0
    b = (((np.arange(n_classes) * 13) % 9) - 4) / 10.0
    return W, b


def batch_score(
    df: DataFrame,
    n_classes: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str | None = "label",
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every row with the frozen linear model: one matmul per Arrow
    batch → (id[, label][, passthrough...], label_pred, score). Ties break to
    the lowest class index (numpy argmax), matching the oracle's ordered
    CASE. passthrough_cols ride through the map unchanged (their types come
    from the input schema) — the crossing-evaluation composition uses this to
    keep (orbit, order) attached without a post-join."""
    keep_label = label_col is not None and label_col in df.columns
    schema = f"{id_col} long" + (f", {label_col} int" if keep_label else "")
    for c in passthrough_cols:
        schema += f", {c} {df.schema[c].dataType.simpleString()}"
    schema += ", label_pred int, score double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W = b = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if W is None:
                W_, b_ = linear_model(n_classes, M.shape[1])
                W, b = W_.T, b_  # (dim, classes)
            S = M @ W + b
            out = {id_col: pdf[id_col].to_numpy()}
            if keep_label:
                out[label_col] = pdf[label_col].to_numpy()
            for c in passthrough_cols:
                out[c] = pdf[c].to_numpy()
            out["label_pred"] = S.argmax(axis=1).astype(np.int32)
            out["score"] = np.round(S.max(axis=1), 4)
            yield pd.DataFrame(out)

    cols = [id_col, vec_col] + ([label_col] if keep_label else [])
    cols += [c for c in passthrough_cols]
    return df.select(*cols).mapInPandas(score, schema)


def batch_score_oracle_sql(
    n_classes: int = 10, dim: int = 64, table: str = "embeddings"
) -> str:
    """DuckDB oracle for batch_score: list_dot_product against the same
    literal weights, argmax via an ordered CASE (lowest index wins ties)."""
    W, b = linear_model(n_classes, dim)
    score_cols = ", ".join(
        f"list_dot_product(embedding::DOUBLE[], [{', '.join(repr(float(x)) for x in W[c])}])"
        f" + {b[c]!r} AS s{c}"
        for c in range(n_classes)
    )
    argmax_cases = " ".join(
        f"WHEN s{c} >= greatest({', '.join(f's{j}' for j in range(n_classes))}) THEN {c}"
        for c in range(n_classes)
    )
    return f"""
    WITH s AS (SELECT vec_id, label, {score_cols} FROM {table})
    SELECT vec_id, label,
           CASE {argmax_cases} END AS label_pred,
           round(greatest({', '.join(f's{j}' for j in range(n_classes))}), 4) AS score
    FROM s
    """
