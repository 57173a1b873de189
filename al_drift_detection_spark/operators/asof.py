"""As-of join — Spark has no native one (pyspark_guide.md 'Common OLAP
patterns'); the reference correlates only by position (SURVEY.md §2.3), but a
time-series validation engine needs point-in-time lookups (e.g. latest
reference sketch at-or-before a window's timestamp).

Implementation: the union + single-window carry-forward plan —
tag left rows (t, side=1) and right rows (t, side=0), sort within each key by
(t, side), and carry the most recent right-side payload forward with
last(..., ignorenulls=True). ONE shuffle on the join key, no range explosion,
no per-key Python. Right-side ties on (key, t) are pre-deduplicated
deterministically (greatest tiebreaker wins) so results are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For each left row: the payload of the latest right row with
    right_ts <= left_ts within the same key (inclusive). Left columns are
    preserved; payload columns are null when no right row precedes."""
    if tiebreak_col is not None:
        w_dedup = Window.partitionBy(key, right_ts).orderBy(F.desc(tiebreak_col))
        right = (
            right.withColumn("_rk", F.row_number().over(w_dedup))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )

    left_cols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols if c not in (key, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (key, left_ts)],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    both = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "*",
        *[
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(key),
        F.col("_t").alias(left_ts),
        *[F.col(c) for c in left_cols if c not in (key, left_ts)],
        *[F.col(f"_asof_{c}").alias(c) for c in payload_cols],
    )
