"""Incremental MinHash-LSH dedup (VERDICT r5 "What's missing" #1): a second
ingest batch signs only its new docs, probes the persisted signature/band
store, and the union of per-batch pair outputs equals the one-shot full
recompute. Reference analog: incremental-vs-full retrain
(/root/reference/gan.py:161-170)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _docs(spark, ids_texts):
    return spark.createDataFrame(
        pd.DataFrame(ids_texts, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


BASE_TEXT = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture()
def corpus(spark):
    """Two batches with planted near-dups WITHIN and ACROSS batches:
    0/1 near-identical (batch 1), 10 a copy of 0 (cross-batch), 11/12
    near-identical (batch 2), rest distinct."""
    b1 = _docs(spark, [
        (0, BASE_TEXT),
        (1, BASE_TEXT + " extra"),
        (2, "completely different words about spark and parquet tables"),
        (3, "yet another unrelated document mentioning drift detection"),
    ])
    b2 = _docs(spark, [
        (10, BASE_TEXT),                       # cross-batch dup of 0
        (11, "some brand new ingest text with shared shingle content ok"),
        (12, "some brand new ingest text with shared shingle content yes"),
        (13, "fully unique second batch document with no duplicate twin"),
    ])
    return b1, b2


def test_incremental_union_equals_full_recompute(spark, corpus, tmp_path):
    from al_drift_detection_spark.functions.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        release,
    )

    b1, b2 = corpus
    store = str(tmp_path / "banded")
    p1 = incremental_minhash_pairs(b1, store, k=16, bands=4)
    p2 = incremental_minhash_pairs(b2, store, k=16, bands=4)
    inc = (
        p1.unionByName(p2)
        .select("a_id", "b_id", "est_jaccard")
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    fullf = minhash_lsh_pairs(b1.unionByName(b2), k=16, bands=4)
    full = (
        fullf.toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    release(fullf)
    pd.testing.assert_frame_equal(inc, full)
    # the planted dups actually surface (non-vacuous parity)
    got_pairs = set(zip(inc["a_id"], inc["b_id"]))
    assert (0, 10) in got_pairs      # cross-batch exact dup
    assert (0, 1) in got_pairs       # in-batch-1 near dup
    assert (11, 12) in got_pairs     # in-batch-2 near dup


def test_second_batch_signs_only_new_docs(spark, corpus, tmp_path):
    """Metric check (VERDICT r5 item 4): with overlapping ids re-ingested,
    batch 2 signs exactly its truly-new docs — visible in n_new_signed AND
    in the store's row delta (new_docs × bands)."""
    from al_drift_detection_spark.functions.dedup import incremental_minhash_pairs

    b1, b2 = corpus
    store = str(tmp_path / "banded")
    incremental_minhash_pairs(b1, store, k=16, bands=4)
    rows_after_b1 = spark.read.parquet(store).count()
    assert rows_after_b1 == 4 * 4  # 4 docs × 4 bands

    # re-ingest: batch 2 plus two ALREADY-SIGNED docs (a re-crawled shard)
    reingest = b2.unionByName(b1.filter(F.col("doc_id").isin(0, 1)))
    p2 = incremental_minhash_pairs(reingest, store, k=16, bands=4)
    assert p2.select("n_new_signed").head()[0] == 4  # only 10-13 signed
    assert spark.read.parquet(store).count() == rows_after_b1 + 4 * 4


def test_rerun_is_idempotent(spark, corpus, tmp_path):
    """Re-running an already-ingested batch signs nothing, emits nothing,
    and leaves the store untouched (crash-retry safety: pairs were already
    emitted by the run that appended the signatures)."""
    from al_drift_detection_spark.functions.dedup import incremental_minhash_pairs

    b1, _ = corpus
    store = str(tmp_path / "banded")
    p1 = incremental_minhash_pairs(b1, store, k=16, bands=4)
    assert p1.count() > 0
    before = spark.read.parquet(store).count()
    p1_again = incremental_minhash_pairs(b1, store, k=16, bands=4)
    assert p1_again.count() == 0
    assert spark.read.parquet(store).count() == before


def test_registry_entry_parity_column(spark):
    """q_incremental_dedup_pairs on the real documents table: every row
    carries parity_with_full == True (the self-verifying gate column)."""
    from al_drift_detection_spark.operators import REGISTRY

    out = REGISTRY["q_incremental_dedup_pairs"].fn(
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert len(out) > 0
    assert out["parity_with_full"].all()
