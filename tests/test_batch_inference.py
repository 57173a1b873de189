"""Batch-inference-as-dataflow (SURVEY §2.11, ref cnn.py:221-236): the
frozen linear model scored via mapInPandas must agree exactly with a
driver-side numpy evaluation, and its predictions must flow through the
A6-A10 metric block end to end."""

from __future__ import annotations

import numpy as np
import pytest

from al_drift_detection_spark import metrics as M
from al_drift_detection_spark.functions.inference import batch_score, linear_model

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_batch_score_matches_numpy(spark, emb):
    got = batch_score(emb, n_classes=10).toPandas().sort_values("vec_id")
    pdf = emb.select("vec_id", "embedding", "label").toPandas().sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    W, b = linear_model(10, X.shape[1])
    S = X @ W.T + b
    assert got["label_pred"].to_numpy().tolist() == S.argmax(axis=1).tolist()
    assert np.allclose(got["score"].to_numpy(), np.round(S.max(axis=1), 4))
    # labels pass through untouched
    assert got["label"].to_numpy().tolist() == pdf["label"].to_numpy().tolist()


def test_inference_feeds_metric_block(spark, emb):
    scored = batch_score(emb, n_classes=10)
    cm = M.confusion_counts(scored, "label", "label_pred")
    acc = M.accuracy(scored, "label", "label_pred").first()["accuracy"]
    prf = M.prf_from_confusion(cm).toPandas().set_index("label").sort_index()

    # driver-side numpy evaluation of the same predictions
    pdf = emb.select("embedding", "label").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    W, b = linear_model(10, X.shape[1])
    pred = (X @ W.T + b).argmax(axis=1)
    y = pdf["label"].to_numpy()
    assert acc == pytest.approx((pred == y).mean(), abs=1e-6)
    for c in sorted(set(y) | set(pred)):
        tp = ((pred == c) & (y == c)).sum()
        colsum, rowsum = (pred == c).sum(), (y == c).sum()
        exp_prec = tp / colsum if colsum else 0.0
        exp_rec = tp / rowsum if rowsum else 0.0
        assert prf.loc[c, "prec"] == pytest.approx(exp_prec, abs=1e-6)
        assert prf.loc[c, "rec"] == pytest.approx(exp_rec, abs=1e-6)
        assert prf.loc[c, "support"] == rowsum
