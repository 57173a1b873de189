from __future__ import annotations

import pandas as pd
import numpy as np
from pyspark.sql import functions as F


def test_asof_join_semantics(spark):
    from al_drift_detection_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 1, "e")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0, 1), (1, 10, 200.0, 2), (1, 15, 300.0, 3), (2, 8, 400.0, 4)],
        "k long, rt long, price double, rid long",
    )
    out = {
        (r["k"], r["t"]): r["price"]
        for r in asof_join(
            left, right, "k", "t", "rt", ["price"], tiebreak_col="rid"
        ).collect()
    }
    assert out[(1, 10)] == 200.0  # inclusive match; tie at rt=10 → max rid wins
    assert out[(1, 20)] == 300.0  # latest preceding
    assert out[(1, 5)] is None    # nothing precedes
    assert out[(2, 7)] is None    # right row is after left ts
    assert out[(3, 1)] is None    # key has no right rows


def test_sequence_features_vs_pandas(spark):
    from al_drift_detection_spark.operators.windows import sequence_features

    pdf = pd.DataFrame(
        {
            "g": [1] * 6 + [2] * 4,
            "o": list(range(6)) + list(range(4)),
            "v": [float(x) for x in [5, 6, 7, 8, 9, 10, 100, 200, 300, 400]],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        sequence_features(df, "g", ["o"], "v", k=3)
        .toPandas()
        .sort_values(["g", "o"])
        .reset_index(drop=True)
    )
    # group 1, row o=0: zero-padded head + current
    assert list(got.loc[0, "features"]) == [0.0, 0.0, 0.0, 5.0]
    assert got.loc[0, "target"] == 6.0
    # group 1, row o=4: [6,7,8,9], target 10
    assert list(got.loc[4, "features"]) == [6.0, 7.0, 8.0, 9.0]
    assert got.loc[4, "target"] == 10.0
    # last row of each group: target null
    assert pd.isna(got.loc[5, "target"]) and pd.isna(got.loc[9, "target"])
    # group 2 independent (no leakage across groups)
    assert list(got.loc[6, "features"]) == [0.0, 0.0, 0.0, 100.0]
