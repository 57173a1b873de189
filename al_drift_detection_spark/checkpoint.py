"""Partition-keyed checkpoint / lineage table → idempotent resume (north_rule).

The reference has NO checkpointing — every rerun starts from scratch
(SURVEY.md §1.3). Here a run is resumable: each partition's verdict status is
upserted into a tiny parquet table keyed by (run_id, part); `--resume` skips
partitions whose every check passed.

On Delta/Iceberg deployments `record` is literally `MERGE INTO checkpoint
USING updates ON run_id/part WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`;
those jars are absent in this container (pyspark_guide.md), so the upsert is
emulated with the standard anti-join+union pattern. The table is O(parts)
rows — a few KB even at 10^6 partitions — so the rewrite is negligible and
safe to round-trip through the driver.
"""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CKPT_SCHEMA = "run_id string, part int, status string, n_checks long, updated_at timestamp"


class Checkpoint:
    def __init__(self, path: str, run_id: str = "run1"):
        self.path = path
        self.run_id = run_id

    def load(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.path):
            # crash-recovery: if a rewrite died between the two renames in
            # record(), the previous table survives at .__old__
            old = f"{self.path}.__old__"
            if os.path.exists(old):
                os.rename(old, self.path)
            else:
                return None
        return spark.read.parquet(self.path)

    def passed_parts(self, spark: SparkSession) -> list[int]:
        df = self.load(spark)
        if df is None:
            return []
        return [
            r["part"]
            for r in df.filter(
                (F.col("run_id") == self.run_id) & (F.col("status") == "pass")
            ).select("part").collect()
        ]

    def filter_pending(self, df: DataFrame, part_col: str = "part") -> DataFrame:
        """Drop partitions already recorded as fully passed.

        Uses a partition-column IN filter (not a join) so Catalyst turns it
        into partition pruning at the Iceberg/parquet scan — already-passed
        data is never read.
        """
        spark = SparkSession.getActiveSession()
        done = self.passed_parts(spark)
        if not done:
            return df
        return df.filter(~F.col(part_col).isin(done))

    def record(self, verdicts: DataFrame, part_col: str = "part") -> None:
        """Upsert per-partition status: pass iff ALL checks passed."""
        spark = verdicts.sparkSession
        new = (
            verdicts.groupBy(part_col)
            .agg(
                F.count(F.lit(1)).alias("n_checks"),
                F.sum(F.when(F.col("verdict") == "fail", 1).otherwise(0)).alias("_fails"),
            )
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.col(part_col).cast("int").alias("part"),
                F.when(F.col("_fails") == 0, "pass").otherwise("fail").alias("status"),
                F.col("n_checks").cast("long"),
                F.lit(datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)).alias(
                    "updated_at"
                ),
            )
        )
        existing = self.load(spark)
        if existing is not None:
            # MERGE emulation: keep existing rows whose key is not updated
            keep = existing.join(
                new.select("run_id", "part"), ["run_id", "part"], "left_anti"
            )
            merged = keep.unionByName(new)
        else:
            merged = new
        # tiny table: break lineage through the driver, then a crash-safe
        # rewrite — write to a temp sibling, swap via rename (never delete the
        # live table before its replacement is fully written; load() recovers
        # from .__old__ if we die between the renames)
        pdf = merged.toPandas()
        tmp, old = f"{self.path}.__tmp__", f"{self.path}.__old__"
        spark.createDataFrame(pdf, schema=CKPT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
