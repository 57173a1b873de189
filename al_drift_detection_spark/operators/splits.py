"""Dataset split assembly: the reference's per-drift train/valid/test
selection (SURVEY §3.2 steps 3-4, /root/reference/cnn.py:503-560) as ONE
composed DataFrame operator.

Reference rules, made deterministic (the reference uses random.sample,
cnn.py:518 — a per-run nondeterminism we deliberately fix, like gan.py:913):

- groups (orbits) belong to a drift regime (the loaded drifts file, J1);
- per drift: test = the first max(n//5, 1) groups in deterministic group
  order (M5, cnn.py:514-524), valid = the next max(n//5, 1) groups (M3 with
  the seeded sample replaced by the same deterministic order);
- train = the top `max_orbits` REMAINING groups ranked by label entropy
  descending, ties by group id (W6/O2, cnn.py:530-533; entropy A5,
  cnn.py:69-83); anything past the cap is 'unused' — with the reference's
  ≥1-train fallback guaranteed by construction (n ≥ test+valid+0 ⇒ at least
  one remaining group whenever n ≥ 3; for n < 3 the test/valid minima leave
  train possibly empty, exactly like the reference's edge case before its
  fallback, cnn.py:550-554 — callers with tiny drifts should lower the
  minima).

Plan shape: one groupBy (group, label) count → entropy agg per group (A5) →
two window ranks per drift → CASE. No UDF, two small shuffles; at 10⁹ rows
the heavy input reduces to O(groups) rows in the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_entropy(
    df: DataFrame, group_col: str, label_col: str
) -> DataFrame:
    """A5: Shannon entropy (nats) of the label distribution per group."""
    counts = df.groupBy(group_col, label_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = Window.partitionBy(group_col)
    p = F.col("_n") / F.sum("_n").over(tot)
    plogp = counts.select(group_col, (-p * F.log(p)).alias("_plogp"))
    return plogp.groupBy(group_col).agg(F.sum("_plogp").alias("entropy"))


def split_assignment(
    df: DataFrame,
    drift_map: DataFrame,
    group_col: str = "grp",
    label_col: str = "label",
    drift_col: str = "drift",
    max_orbits: int = 8,
) -> DataFrame:
    """(group, drift, entropy, split) with split ∈ train/valid/test/unused.

    drift_map: (group_col, drift_col) — the verdict table (the reference's
    drifts_setN.txt loaded back, util.py:101-117) joined broadcast.
    """
    ent = group_entropy(df, group_col, label_col)
    groups = ent.join(F.broadcast(drift_map), group_col)

    by_drift = Window.partitionBy(drift_col)
    in_order = Window.partitionBy(drift_col).orderBy(group_col)
    n = F.count(F.lit(1)).over(by_drift)
    take: Column = F.greatest(F.floor(n / 5), F.lit(1))  # 20%-or-1 (M5)
    pos = F.row_number().over(in_order)
    staged = groups.select(
        group_col,
        drift_col,
        "entropy",
        n.alias("_n"),
        take.alias("_take"),
        pos.alias("_pos"),
    )
    # remaining (non-test/valid) groups ranked by entropy desc for the train
    # cap (W6); non-remaining rows also get ranks in their own partition but
    # the split CASE never consults those. Rank on entropy ROUNDED to 9dp:
    # FP summation order differs across engines/runs, and an ulp of noise
    # between equal-distribution groups would otherwise flip ranks
    remaining = Window.partitionBy(drift_col, "_is_rest").orderBy(
        F.desc(F.round("entropy", 9)), F.asc(group_col)
    )
    staged = staged.withColumn(
        "_is_rest", F.col("_pos") > 2 * F.col("_take")
    ).withColumn("_rest_rank", F.row_number().over(remaining))
    split = (
        F.when(F.col("_pos") <= F.col("_take"), "test")
        .when(F.col("_pos") <= 2 * F.col("_take"), "valid")
        .when(F.col("_rest_rank") <= max_orbits, "train")
        .otherwise("unused")
    )
    return staged.select(
        group_col,
        drift_col,
        F.round("entropy", 6).alias("entropy"),
        split.alias("split"),
    )
