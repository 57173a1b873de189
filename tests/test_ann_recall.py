"""ANN recall hardening: on a planted clustered corpus (where near
neighbours exist by construction), IVF with trained centroids and
multi-probe LSH must both reach recall@10 ≥ 0.9 vs the exact brute-force
baseline, and multi-probe must beat single-probe."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from al_drift_detection_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
    train_ivf_centroids,
)

DIM = 32
N_CLUSTERS = 8
PER_CLUSTER = 120


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 4.0
    rows = []
    for ci in range(N_CLUSTERS):
        pts = centers[ci] + rng.standard_normal((PER_CLUSTER, DIM)) * 0.5
        rows += [
            (ci * PER_CLUSTER + i, [float(x) for x in p]) for i, p in enumerate(pts)
        ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    df.count()
    # queries: one perturbed member per cluster (so true top-k is in-cluster)
    queries = [
        [float(x) for x in centers[ci] + rng.standard_normal(DIM) * 0.4]
        for ci in range(3)
    ]
    return df, queries


def _recall(spark_df_ids: list, truth_ids: list) -> float:
    return len(set(spark_df_ids) & set(truth_ids)) / len(truth_ids)


def test_ivf_trained_centroids_recall(spark, clustered):
    df, queries = clustered
    cents = train_ivf_centroids(df, k=N_CLUSTERS, sample_n=512, seed=42, iters=10)
    assert len(cents) == N_CLUSTERS and len(cents[0]) == DIM
    recalls = []
    for q in queries:
        truth = [r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()]
        got = [r["vec_id"] for r in ivf_topk(df, q, cents, k=10, n_probe=2).collect()]
        recalls.append(_recall(got, truth))
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_multiprobe_recall_beats_single(spark, clustered):
    df, queries = clustered
    single, multi = [], []
    for q in queries:
        truth = [r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()]
        got1 = [r["vec_id"] for r in
                lsh_ann_topk(df, q, DIM, k=10, n_planes=8, probe_radius=0).collect()]
        got2 = [r["vec_id"] for r in
                lsh_ann_topk(df, q, DIM, k=10, n_planes=8, probe_radius=2).collect()]
        single.append(_recall(got1, truth))
        multi.append(_recall(got2, truth))
    assert np.mean(multi) >= 0.9, (single, multi)
    assert np.mean(multi) >= np.mean(single)


def test_trainer_is_deterministic(spark, clustered):
    df, _ = clustered
    a = train_ivf_centroids(df, k=4, sample_n=256, seed=7, iters=5)
    b = train_ivf_centroids(df, k=4, sample_n=256, seed=7, iters=5)
    assert a == b


def test_ivf_preassigned_parity(spark, clustered):
    """ivf_topk over a precomputed ivf_assign table (the partition-pruned
    deployment shape) returns exactly the on-the-fly result."""
    from al_drift_detection_spark.functions.similarity import ivf_assign

    df, queries = clustered
    cents = train_ivf_centroids(df, k=N_CLUSTERS, sample_n=512, seed=42, iters=10)
    assigned = ivf_assign(df, cents).cache()
    assert assigned.select("cell").distinct().count() <= N_CLUSTERS
    for q in queries[:2]:
        a = [r["vec_id"] for r in ivf_topk(df, q, cents, k=10, n_probe=2).collect()]
        b = [r["vec_id"] for r in
             ivf_topk(df, q, cents, k=10, n_probe=2, assigned=assigned).collect()]
        assert a == b


def test_q_ivf_topk_self_verifying_recall_column(spark):
    """The gate's one rows-only entry carries its own evidence: the
    recall_at_10 column equals an independently recomputed recall vs the
    exact top-k on the same corpus. (The 0.9 floor above holds on CLUSTERED
    data, where IVF's partition pruning is sound; the gate's synthetic
    embeddings are near-orthogonal, so the honest measured value there is
    lower — the column exposes exactly that.)"""
    from pyspark.sql import functions as F

    from al_drift_detection_spark.operators import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["q_ivf_topk"].fn(spark, sf).toPandas()
    assert len(out) == 10
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    truth = {
        r["vec_id"]
        for r in brute_force_topk(emb.filter(F.col("vec_id") > 0), q, k=10).collect()
    }
    expected = round(len(set(out["vec_id"]) & truth) / 10.0, 2)
    assert (out["recall_at_10"] == expected).all()
    assert expected >= 0.5  # sanity floor even without cluster structure


def test_embedding_outlier_rates_planted(spark):
    """Clustered corpus: in-cluster rows score low, rows planted EXACTLY
    orthogonal to the trained centroid span score 1.0 and only their
    windows fail; a thin window is 'insufficient'; clean non-ref windows
    pass. Scores are scale-invariant (cosine), so magnitude garbage alone
    never flags."""
    import numpy as np

    from al_drift_detection_spark.functions.similarity import (
        embedding_outlier_rates,
        embedding_outlier_scores,
        orthogonal_direction,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(7)
    dim, per_w = 16, 60
    # 3 tight clusters; every row = cluster center + small noise
    centers = rng.normal(size=(3, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for w in range(5):
        for i in range(per_w):
            c = centers[i % 3]
            v = c + 0.05 * rng.normal(size=dim)
            rows.append((vid, w, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, w int, embedding array<double>")
    cents = train_ivf_centroids(df, k=3, sample_n=128, seed=1, iters=8)
    ood = orthogonal_direction(cents, dim)
    # window 4: replace 20% of rows with the orthogonal direction
    planted = df.select(
        "vec_id", "w",
        F.when(
            (F.col("w") == 4) & (F.col("vec_id") % 5 == 0),
            F.array(*[F.lit(float(x)) for x in ood]),
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    got = (
        embedding_outlier_rates(
            planted, cents, "w", ref_filter=F.col("w") < 2,
            tail=0.05, rate_factor=2.0, min_rows=20,
        )
        .toPandas().set_index("w").sort_index()
    )
    assert got.loc[2, "verdict"] == "pass"
    assert got.loc[3, "verdict"] == "pass"
    assert got.loc[4, "verdict"] == "fail"
    assert got.loc[4, "rate"] >= 0.15
    # planted rows score exactly 1.0 (orthogonal by construction)
    s = embedding_outlier_scores(
        planted.filter((F.col("w") == 4) & (F.col("vec_id") % 5 == 0)), cents
    ).agg(F.min("ood_score"), F.max("ood_score")).first()
    assert s[0] == 1.0 and s[1] == 1.0


def test_embedding_outlier_insufficient_window(spark):
    import numpy as np

    from al_drift_detection_spark.functions.similarity import (
        embedding_outlier_rates,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, 0 if i < 40 else 1, [float(x) for x in rng.normal(size=8)])
        for i in range(45)  # window 1 has only 5 rows
    ]
    df = spark.createDataFrame(rows, "vec_id long, w int, embedding array<double>")
    cents = [[1.0] + [0.0] * 7, [0.0, 1.0] + [0.0] * 6]
    got = (
        embedding_outlier_rates(
            df, cents, "w", ref_filter=F.col("w") == 0, min_rows=20
        )
        .toPandas().set_index("w")
    )
    assert got.loc[1, "verdict"] == "insufficient"


def test_embedding_outlier_empty_reference_is_loud(spark):
    """A ref_filter selecting no rows yields a NULL threshold — every
    window must read 'no_reference', never a silent fall-through 'pass'
    (the health-family silent-all-pass trap, kept relational here)."""
    import numpy as np

    from al_drift_detection_spark.functions.similarity import (
        embedding_outlier_rates,
    )

    rng = np.random.default_rng(5)
    rows = [(i, 1, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, w int, embedding array<double>")
    cents = [[1.0] + [0.0] * 7]
    got = embedding_outlier_rates(
        df, cents, "w", ref_filter=F.col("w") == 0, min_rows=20
    ).toPandas()
    assert (got["verdict"] == "no_reference").all()
