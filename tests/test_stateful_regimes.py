"""Streaming regime identity golden: base → base → shifted (novel) → base
(recurring 1) → shifted (recurring 2), one micro-batch per window — the
incremental form of the drifts_set1.txt contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_stateful_streaming_regimes(spark, tmp_path_factory):
    from al_drift_detection_spark.streaming.stateful_regimes import stateful_regimes

    base = tmp_path_factory.mktemp("sregimes")
    inp = str(base / "in")
    rng = np.random.default_rng(5)

    # one file per window; maxFilesPerTrigger=1 → one micro-batch per window
    for i, mu in enumerate([0.0, 0.0, 8.0, 0.0, 8.0]):
        pdf = pd.DataFrame({"scope": 0, "v": rng.normal(mu, 1.0, 900)})
        spark.createDataFrame(pdf).select(
            F.col("scope").cast("int"), F.col("v").cast("double")
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(inp)

    stream = (
        spark.readStream.schema("scope int, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    out = stateful_regimes(stream, ["v"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sregimes_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sregimes_out").toPandas()

    assert len(got) == 5
    # micro-batch order == file order; regime ids follow the golden shape
    assert sorted(got["regime_id"].tolist()) == sorted([1, 1, 2, 1, 2])
    assert (got["is_new"]).sum() == 1  # exactly one novel regime minted
    assert got["n_regimes"].max() == 2  # catalog holds exactly 2 regimes
    # recurring windows matched with a healthy p; the novel one didn't
    novel = got[got["is_new"]]
    assert (novel["matched_p"] < 0.05).all()
    recur = got[(got["regime_id"] == 2) & (~got["is_new"])]
    assert (recur["matched_p"] >= 0.05).all()


def test_stateful_regimes_catalog_cap_evicts(spark, tmp_path_factory):
    """Drift-every-batch stream with max_regimes: the catalog-as-state stays
    bounded via LRU eviction (VERDICT r4 item 8 applied to the STREAMING
    form — unbounded growth here is a state-store OOM, re-serialized every
    micro-batch)."""
    from al_drift_detection_spark.streaming.stateful_regimes import stateful_regimes

    base = tmp_path_factory.mktemp("sregimes_cap")
    inp = str(base / "in")
    rng = np.random.default_rng(19)

    # six disjoint distributions → every batch after the bootstrap drifts
    for i, mu in enumerate([0.0, 50.0, 100.0, 150.0, 200.0, 250.0]):
        pdf = pd.DataFrame({"scope": 0, "v": rng.normal(mu, 1.0, 600)})
        spark.createDataFrame(pdf).select(
            F.col("scope").cast("int"), F.col("v").cast("double")
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(inp)

    stream = (
        spark.readStream.schema("scope int, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    out = stateful_regimes(stream, ["v"], max_regimes=3, on_overflow="evict_lru")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sregimes_cap_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sregimes_cap_out").toPandas()

    assert len(got) == 6               # every batch still gets a verdict
    assert got["n_regimes"].max() <= 3  # catalog bounded
    assert got["is_new"].sum() == 5     # each disjoint batch minted (evicted
    #                                     regimes are forgotten, never re-matched)
