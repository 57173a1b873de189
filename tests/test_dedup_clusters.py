"""Duplicate-cluster resolution + SimHash pair generation: planted dup
chains collapse to one canonical doc; near-identical docs pair, disjoint
docs don't."""

from __future__ import annotations

from al_drift_detection_spark.functions.dedup import dedup_clusters, simhash_pairs


def test_clusters_collapse_planted_chains(spark):
    nodes = spark.createDataFrame(
        [(x,) for x in "abcdefg"], "doc_id string"
    )
    # chain a-b-c (a~b, b~c but NOT a~c directly), pair d-e, singletons f, g
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "a_id string, b_id string"
    )
    out = {r["doc_id"]: (r["canonical_id"], r["keep"])
           for r in dedup_clusters(nodes, pairs).collect()}
    assert out == {
        "a": ("a", True), "b": ("a", False), "c": ("a", False),
        "d": ("d", True), "e": ("d", False),
        "f": ("f", True), "g": ("g", True),
    }


def test_clusters_long_chain_converges(spark):
    # a 12-node path graph needs multiple propagation rounds — exercises the
    # fixpoint loop, not just one hop
    ids = [f"n{i:02d}" for i in range(12)]
    nodes = spark.createDataFrame([(x,) for x in ids], "doc_id string")
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(11)], "a_id string, b_id string"
    )
    out = dedup_clusters(nodes, pairs).toPandas()
    assert (out["canonical_id"] == "n00").all()
    assert out[out["keep"]]["doc_id"].tolist() == ["n00"]


def test_simhash_pairs_planted(spark):
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps on the warm mat near the old wooden door of the house")
    near = base.replace("lazy", "sleepy")  # one-token edit → tiny hamming gap
    disjoint = ("completely different words about spacecraft telemetry "
                "magnetometer orbits plasma instruments calibration data "
                "downlink schedules and archive formats for the mission")
    df = spark.createDataFrame(
        [("d1", base), ("d2", near), ("d3", disjoint)], "doc_id string, text string"
    )
    got = {(r["a_id"], r["b_id"]) for r in
           simhash_pairs(df, max_distance=16, bands=32).collect()}
    assert ("d1", "d2") in got
    assert ("d1", "d3") not in got and ("d2", "d3") not in got


def test_simhash_pairs_hamming_exact(spark):
    # identical docs → hamming 0, always found regardless of banding
    df = spark.createDataFrame(
        [("x", "alpha beta gamma delta"), ("y", "alpha beta gamma delta")],
        "doc_id string, text string",
    )
    rows = simhash_pairs(df, max_distance=3, bands=4).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0
