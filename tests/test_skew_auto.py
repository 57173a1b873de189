"""Auto-salted aggregation (skew.salted_agg_auto, VERDICT r6 Next #7):
the measured skew profile drives the salt fan-out — hot keys level across
reducers with no hand-plumbed salt, uniform keys keep the plain one-level
aggregate, and values always equal the unsalted group-by."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _skewed(spark, n=20_000, hot_share=0.95):
    """Planted skew: one key holds 95% of rows."""
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


AGGS = lambda: {  # noqa: E731 — fresh Column objects per use
    "n": F.count(F.lit(1)),
    "sum_v": F.sum("v"),
    "min_v": F.min("v"),
    "max_v": F.max("v"),
}


def _plain(df):
    return (
        df.groupBy("k")
        .agg(*[c.alias(n) for n, c in AGGS().items()])
        .orderBy("k")
        .toPandas()
        .reset_index(drop=True)
    )


def test_auto_fanout_from_planted_skew_and_parity(spark):
    """On the 95%-hot-key frame the derived fan-out is > 1 (the profile's
    ceil(skew_ratio)), the physical plan is the genuine TWO-STAGE shape —
    level-1 keyed by (k, _salt) so no single task owns the hot key, level-2
    by k alone — and values equal the plain group-by exactly."""
    from al_drift_detection_spark.skew import salted_agg_auto

    df = _skewed(spark)
    out, n_salts = salted_agg_auto(df, ["k"], AGGS(), row_key="row_id")
    assert n_salts > 1

    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-stage: a grouping that includes the salt, then one without it
    assert "_salt" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final × two levels
    # the FINAL projection carries no salt column
    assert "_salt" not in out.columns

    got = out.orderBy("k").toPandas().reset_index(drop=True)
    want = _plain(df)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_uniform_key_falls_back_to_plain_agg(spark):
    """A uniform key derives fan-out 1: the plain one-level aggregate, no
    salt column anywhere in the plan (a pointless second shuffle is the
    failure mode this guards)."""
    from al_drift_detection_spark.skew import salted_agg_auto

    df = spark.range(8_000).select(
        (F.col("id") % 8).cast("string").alias("k"),
        F.col("id").alias("row_id"),
        F.col("id").cast("double").alias("v"),
    )
    out, n_salts = salted_agg_auto(df, ["k"], AGGS(), row_key="row_id")
    assert n_salts == 1
    assert "_salt" not in out._jdf.queryExecution().executedPlan().toString()
    pd.testing.assert_frame_equal(
        out.orderBy("k").toPandas().reset_index(drop=True), _plain(df)
    )


def test_supplied_profile_and_int_override(spark):
    """A precomputed skew_profile frame or an explicit int fan-out short-
    circuits the measurement pass; values are invariant to the fan-out."""
    from al_drift_detection_spark.skew import salted_agg_auto, skew_profile

    df = _skewed(spark)
    prof = skew_profile(df, "k", max_salts=8)
    out_p, n_p = salted_agg_auto(df, ["k"], AGGS(), "row_id", profile=prof)
    out_i, n_i = salted_agg_auto(df, ["k"], AGGS(), "row_id", profile=5)
    assert n_p > 1 and n_i == 5
    pd.testing.assert_frame_equal(
        out_p.orderBy("k").toPandas().reset_index(drop=True),
        out_i.orderBy("k").toPandas().reset_index(drop=True),
    )


def test_salted_stats_cli_matches_plain_groupby(spark, tmp_path):
    """`runner --salted-stats` end-to-end on the fmt-skewed images table:
    fmt_stats/ values equal the plain group-by recomputed here, and the
    profile-derived fan-out is recorded."""
    from al_drift_detection_spark import runner

    out = str(tmp_path / "out")
    assert runner.main([
        "--images", "synthetic:6000", "--out", out,
        "--master", "local[8]", "--salted-stats",
    ]) == 0
    stats = spark.read.parquet(f"{out}/fmt_stats").toPandas()
    prof = spark.read.parquet(f"{out}/skew_profile").toPandas()
    assert set(prof.columns) >= {"fmt", "cnt", "share", "skew_ratio",
                                 "suggested_salts"}
    assert stats["n_salts_used"].nunique() == 1
    assert stats["n_salts_used"].iloc[0] == prof["suggested_salts"].max()

    from al_drift_detection_spark.datagen import generate_images

    meta = generate_images(spark, 6000).drop("bytes")
    want = (
        meta.groupBy("fmt").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("w").cast("double")).alias("sum_w"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        ).orderBy("fmt").toPandas().reset_index(drop=True)
    )
    got = stats.drop(columns=["n_salts_used"]).sort_values("fmt").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
