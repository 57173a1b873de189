from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_stateful_streaming_drift(spark, tmp_path_factory):
    """Feed clean batches then a shifted batch through a file stream; the
    stateful operator must bootstrap, pass the clean batches, and flag the
    shifted one without contaminating its reference state."""
    from al_drift_detection_spark.streaming.stateful_drift import stateful_drift

    base = tmp_path_factory.mktemp("sdrift")
    inp = str(base / "in")
    rng = np.random.default_rng(11)

    # 4 sequential files => 4 micro-batches (maxFilesPerTrigger=1):
    # f0,f1: N(0,1) (bootstrap + pass), f2: N(0,1) (pass), f3: N(3,1) (fail)
    for i, mu in enumerate([0.0, 0.0, 0.0, 3.0]):
        pdf = pd.DataFrame(
            {"part": 0, "v": rng.normal(mu, 1.0, 800)}
        )
        spark.createDataFrame(pdf).select(
            F.col("part").cast("int"), F.col("v").cast("double")
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(inp)
        # NOTE: all files land before the stream starts; ordering across
        # batches is by file discovery — use one trigger per file.

    stream = (
        spark.readStream.schema("part int, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    out = stateful_drift(stream, ["v"], min_ref=500)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdrift_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sdrift_out").toPandas()

    assert len(got) == 4
    verdicts = list(got.sort_values("p_value", ascending=False)["verdict"])
    # exactly one batch must fail (the shifted one), >=1 bootstrap, rest pass
    assert (got["verdict"] == "fail").sum() == 1
    assert (got["verdict"] == "bootstrap").sum() >= 1
    fail_row = got[got["verdict"] == "fail"].iloc[0]
    assert fail_row["p_value"] < 0.01 and fail_row["statistic"] > 0.5
    # reference state never shrank and drifted rows were not absorbed
    assert got["state_rows"].max() <= 4096
