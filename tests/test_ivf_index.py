"""Persisted incremental IVF index (functions/similarity.py:
build_ivf_index / update_ivf_index / ivf_index_topk): build on one batch,
update with the next under FROZEN centroids, query via partition pruning.
Reference analog: reset_top_layer's frozen-lower-layer incremental retrain
(/root/reference/gan.py:161-170 — SURVEY §4 row 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
P = dict(k=4, sample_n=128, seed=42, iters=5)


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_build_update_parity_and_idempotence(spark, tmp_path):
    """Frozen-centroid assignment is a pure per-row function, so the union
    of build + incremental batches equals a one-shot assignment over the
    full corpus; the update signs only new ids and replays to 0."""
    from al_drift_detection_spark.functions.similarity import (
        build_ivf_index,
        ivf_assign,
        update_ivf_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), path, **P)

    n_odd = emb.filter(F.col("vec_id") % 2 == 1).count()
    assert update_ivf_index(emb, path) == n_odd
    assert update_ivf_index(emb, path) == 0  # idempotent replay

    got = (
        spark.read.parquet(f"{path}/vectors")
        .select("vec_id", "cell")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = (
        ivf_assign(emb, cents)
        .select("vec_id", F.col("cell").cast("int"))
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["cell"].tolist() == want["cell"].tolist()


def test_index_topk_matches_in_memory(spark, tmp_path):
    """The persisted-index query returns exactly the in-memory ivf_topk
    result under the same centroids (the index adds layout, not
    semantics)."""
    from al_drift_detection_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
        load_ivf_centroids,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, **P)
    cents = load_ivf_centroids(spark, path)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    got = ivf_index_topk(spark, path, q, k=10, n_probe=2).toPandas()
    want = ivf_topk(emb, q, cents, k=10, n_probe=2).toPandas()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["cos"].tolist() == want["cos"].tolist()


def test_index_query_prunes_partitions(spark, tmp_path):
    """The 100 TB payoff: the n_probe cell filter lands on the PARTITION
    column of the vectors table — the scan carries PartitionFilters on
    `cell` and reads n_probe directories, never the corpus."""
    from al_drift_detection_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, **P)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    plan = (
        ivf_index_topk(spark, path, q, k=10, n_probe=2)
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    seg = plan.split("PartitionFilters: [", 1)
    assert len(seg) == 2, plan
    assert "cell" in seg[1].split("]", 1)[0], plan


def test_registry_entry_shape(spark):
    """q_ivf_index_topk: 10 ranked rows, n_new_assigned == odd-id count of
    the table (the oracle value-checks the same in SQL)."""
    from al_drift_detection_spark.operators import REGISTRY

    out = REGISTRY["q_ivf_index_topk"].fn(spark, SF).toPandas()
    n_odd = _emb(spark).filter(F.col("vec_id") % 2 == 1).count()
    assert len(out) == 10
    assert (out["n_new_assigned"] == n_odd).all()
    assert out["cos"].iloc[0] == 1.0  # the query vector's own row leads
