"""Constraint suggestion (profile.py): the suggested suite is
self-consistent on the profiled table, catches planted corruption on the
next ingest, and the approx path's bounded exact-confirmation step prevents
false unique suggestions."""

from __future__ import annotations

from pyspark.sql import functions as F

from al_drift_detection_spark.profile import (
    profile_columns,
    suggest_checks,
    suggest_suite,
)


def _docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("part", (F.col("doc_id") % 4).cast("int"))
    )


def test_suggestions_match_table_shape(spark):
    docs = _docs(spark)
    checks, rows = suggest_checks(
        docs, columns=["doc_id", "lang", "source", "n_chars"],
        max_set_card=25, exact_distinct=True,
    )
    by = {(r[0], r[1]): r for r in rows}
    assert ("doc_id", "unique") in by
    assert ("doc_id", "between") in by
    assert ("lang", "in_set") in by and ("source", "in_set") in by
    # every complete column gets not_null
    assert all((c, "not_null") in by for c in ("doc_id", "lang", "source", "n_chars"))
    # in_set values are the sorted observed set
    langs = by[("lang", "in_set")][4].split(",")
    assert langs == sorted(langs) and 1 <= len(langs) <= 25
    # numeric range is the observed min/max (margin 0)
    lo, hi = by[("n_chars", "between")][2], by[("n_chars", "between")][3]
    mm = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert lo == float(mm[0]) and hi == float(mm[1])


def test_suggested_suite_self_consistent_and_catches_corruption(spark):
    docs = _docs(spark).cache()
    suite = suggest_suite(
        docs, part_col="part", row_id_col="doc_id",
        columns=["doc_id", "lang", "source", "n_chars"], exact_distinct=True,
    )
    res = suite.run(docs)
    verd = res.verdicts.toPandas()
    assert (verd["verdict"] == "pass").all()  # self-consistency
    res.unpersist()

    # the NEXT ingest, corrupted four ways: a new lang value, an
    # out-of-range n_chars, a duplicated doc_id, and a null source
    bad = docs.limit(4).collect()
    max_chars = docs.agg(F.max("n_chars")).collect()[0][0]
    corrupt_rows = [
        (bad[0]["doc_id"] + 1_000_000, bad[0]["text"], "zz", bad[0]["source"],
         bad[0]["n_chars"], 0),
        (bad[1]["doc_id"] + 1_000_001, bad[1]["text"], bad[1]["lang"],
         bad[1]["source"], max_chars + 999, 1),
        (bad[2]["doc_id"], bad[2]["text"], bad[2]["lang"], bad[2]["source"],
         bad[2]["n_chars"], 2),  # duplicate doc_id
        (bad[3]["doc_id"] + 1_000_003, bad[3]["text"], bad[3]["lang"], None,
         bad[3]["n_chars"], 3),
    ]
    nxt = docs.unionByName(
        spark.createDataFrame(corrupt_rows, docs.schema)
    )
    res2 = suite.run(nxt)
    v2 = res2.verdicts.toPandas()
    failed = set(v2[v2["verdict"] == "fail"]["check_name"])
    assert {"in_set_lang", "between_n_chars", "unique_doc_id", "not_null_source"} <= failed
    res2.unpersist()
    docs.unpersist()


def test_suite_config_round_trip(spark):
    """suggest → suite_to_config → JSON → suite_from_config reproduces the
    same checks, and the loaded suite still passes on the profiled table."""
    import json

    from al_drift_detection_spark.suite import suite_from_config, suite_to_config

    docs = _docs(spark)
    suite = suggest_suite(
        docs, part_col="part", row_id_col="doc_id",
        columns=["doc_id", "lang", "source", "n_chars"], exact_distinct=True,
    )
    cfg = json.loads(json.dumps(suite_to_config(suite)))  # through real JSON
    loaded = suite_from_config(cfg)
    assert [c.name for c in loaded.checks] == [c.name for c in suite.checks]
    assert [c.kind for c in loaded.checks] == [c.kind for c in suite.checks]
    assert loaded.numeric_stat_cols == ["n_chars"]
    assert loaded.id_stat_cols == ["doc_id"]
    res = loaded.run(docs)
    assert (res.verdicts.toPandas()["verdict"] == "pass").all()
    assert res.stats is not None  # stat cols rode through the config
    res.unpersist()


def test_suggest_cli(spark, tmp_path):
    from al_drift_detection_spark import runner
    from al_drift_detection_spark.suite import suite_from_json

    out = str(tmp_path / "o1")
    assert runner.main(
        ["--images", "synthetic:3000", "--master", "local[8]", "--out", out,
         "--suggest"]
    ) == 0
    sugg = spark.read.parquet(f"{out}/suggested_constraints").toPandas()
    by = set(zip(sugg["column"], sugg["check"]))
    # fmt is low-cardinality → in_set; w/h numeric → between; the planted
    # duplicate image_ids mean unique_image_id must NOT be suggested
    assert ("fmt", "in_set") in by
    assert ("w", "between") in by and ("h", "between") in by
    assert ("image_id", "unique") not in by
    # the runnable JSON artifact loads through the --suite path and carries
    # exactly the parquet evidence's checks
    loaded = suite_from_json(f"{out}/suggested_suite.json")
    assert {(c.column, c.kind) for c in loaded.checks} == by
    # the schema-inference half: every string column of the image table
    # must stay 'string' (ids/captions/fmt suggested numeric would be a
    # false positive)
    types = spark.read.parquet(f"{out}/suggested_types").toPandas()
    assert len(types) > 0
    assert (types["suggested_type"] == "string").all()


def test_approx_profile_confirms_unique_exactly(spark):
    """In approx mode a near-unique column (HLL estimate ≥ gate) must NOT be
    suggested unique when the exact confirmation finds duplicates."""
    n = 5000
    df = spark.range(n).select(
        # one planted duplicate — approx estimate can't see it
        F.when(F.col("id") == 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("truly_unique"),
    )
    checks, rows = suggest_checks(df, columns=["k", "truly_unique"], exact_distinct=False)
    kinds = {(r[0], r[1]) for r in rows}
    assert ("truly_unique", "unique") in kinds
    assert ("k", "unique") not in kinds
    # profile row carries the estimate evidence either way
    prof = profile_columns(df, ["k"], exact_distinct=False)
    assert prof["k"]["n_distinct"] >= (1 - 3 * 0.02) * n


def test_type_suggestions_planted(spark):
    """Type inference for string columns: clean int/double/timestamp strings
    suggest their types; a 95%-parseable column stays 'string' at the 0.99
    threshold; NULLs are excluded from the rates; bare year-like integers
    must NOT suggest timestamp (the date-prefix gate); non-string columns
    are ignored and an all-non-string frame raises."""
    import pytest as _pytest

    from al_drift_detection_spark.profile import type_suggestions

    rows = []
    for i in range(100):
        rows.append((
            str(i),                             # ints -> bigint
            f"{i}.5",                           # decimals -> double
            f"2026-01-{(i % 28) + 1:02d} 03:04:05",  # -> timestamp
            "2026",                             # year-like int: bigint, NOT ts
            str(i) if i % 20 else "oops",       # 95% ints -> stays string
            None if i % 2 else str(i),          # 50% null, non-nulls all int
            i,                                  # non-string: ignored
        ))
    df = spark.createDataFrame(
        rows, "a string, b string, c string, d string, e string, f string, g long"
    )
    got = {r["column"]: r for r in type_suggestions(df).collect()}
    assert set(got) == {"a", "b", "c", "d", "e", "f"}
    assert got["a"]["suggested_type"] == "bigint"
    assert got["b"]["suggested_type"] == "double" and got["b"]["int_rate"] == 0.0
    assert got["c"]["suggested_type"] == "timestamp"
    assert got["d"]["suggested_type"] == "bigint"
    assert got["d"]["timestamp_rate"] == 0.0  # Spark would parse '2026'; gate blocks it
    assert got["e"]["suggested_type"] == "string"
    assert got["e"]["int_rate"] == _pytest.approx(0.95)
    assert got["f"]["suggested_type"] == "bigint"  # rates over NON-NULL values
    assert got["f"]["n_non_null"] == 50

    with _pytest.raises(ValueError, match="no string columns"):
        type_suggestions(df.select("g"))
