"""q_ivf_topk full-oracle machinery (VERDICT r5 item 5): the DuckDB oracle
embeds DATA-TRAINED centroids as SQL literals, which is only sound if the
oracle builder reproduces the Spark trainer bit-for-bit without a Spark
session. These tests pin each link of that chain."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_xxhash64_replica_matches_spark(spark):
    """The numpy xxhash64 replica must equal Spark's expression bit-for-bit
    for the (long col, int lit) shape the IVF sample pick uses — negatives,
    wide magnitudes, and both int-literal seeds."""
    from al_drift_detection_spark.operators.xxh64_replica import xxhash64_long_int

    ids = [0, 1, -1, 7, -42, 2**31, -(2**31) - 1, 2**62, -(2**62), 123456789]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    for lit in (42, 7):
        got = {
            r["vec_id"]: r["h"]
            for r in df.select(
                "vec_id", F.xxhash64(F.col("vec_id"), F.lit(lit)).alias("h")
            ).collect()
        }
        mine = xxhash64_long_int(np.array(ids, dtype=np.int64), lit)
        for i, m in zip(ids, mine):
            assert got[i] == int(m), (i, lit)


def test_oracle_centroids_match_spark_trainer(spark):
    """The oracle builder's sample pick + _spherical_kmeans must reproduce
    train_ivf_centroids' output exactly (same floats, same order) — the
    premise that lets the SQL embed the trained model as literals."""
    import pyarrow.parquet as pq

    from al_drift_detection_spark.functions.similarity import (
        _spherical_kmeans,
        train_ivf_centroids,
    )
    from al_drift_detection_spark.operators.xxh64_replica import xxhash64_long_int

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    spark_cents = train_ivf_centroids(emb, k=8, sample_n=512, seed=42, iters=8)

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    flat = t.column("embedding").combine_chunks().flatten().to_numpy()
    X = flat.reshape(len(ids), len(flat) // len(ids)).astype(np.float64)
    order = np.argsort(xxhash64_long_int(ids, 42), kind="stable")[:512]
    local_cents = _spherical_kmeans(X[order], 8, 42, 8)

    assert np.array_equal(np.asarray(spark_cents), np.asarray(local_cents))


def test_ivf_oracle_value_parity(spark):
    """End-to-end: q_ivf_topk's Spark result equals its lazily-built DuckDB
    oracle at the gate sf — rows, columns, and values (the driver-gate
    comparison, replicated here so a drift in either side fails in pytest
    before the round gate sees it)."""
    import duckdb

    from al_drift_detection_spark.operators import REGISTRY

    spec = REGISTRY["q_ivf_topk"]
    assert callable(spec.sql)
    got = (
        spec.fn(spark, SF)
        .toPandas()
        .sort_values(["vec_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = con.execute(spec.sql()).fetchdf().sort_values(["vec_id"]).reset_index(drop=True)
    assert list(got["vec_id"]) == list(exp["vec_id"])
    assert got["cos"].to_numpy() == pytest.approx(exp["cos"].to_numpy(), abs=1e-9)
    assert got["recall_at_10"].to_numpy() == pytest.approx(
        exp["recall_at_10"].to_numpy(), abs=1e-9
    )
