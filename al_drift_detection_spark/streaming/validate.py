"""Structured Streaming validation: incremental per-batch suite runs and
event-time windowed stats with watermarked late-data handling.

The reference's detector is a sequential single-pass scan with driver state
(SURVEY.md §2.10); the streaming equivalent here is:
- `stream_suite`: file-source readStream → foreachBatch → the SAME CheckSuite
  aggregation per micro-batch, verdicts appended with a batch_id — exactly
  the batch-incremental resume contract (each micro-batch ≅ one partition
  batch; the engine is identical code for batch and streaming);
- `streaming_window_stats`: watermark + tumbling event-time window →
  per-window count/avg/min/max/stddev — the always-on feed for the drift
  kernels (late rows re-enter via watermark semantics instead of the
  reference's 500k-row abort, gan.py:744-747).

Smoke-tested with the file source + an in-memory sink via
processAllAvailable() (no Kafka in the sandbox; source swap is config-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from al_drift_detection_spark.suite import CheckSuite


def stream_suite(
    spark: SparkSession,
    input_path: str,
    schema,  # DDL string or StructType
    suite: CheckSuite,
    out_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 4,
):
    """File-source streaming validation; verdict rows appended per batch.

    Returns the StreamingQuery (caller: processAllAvailable()/stop() in tests,
    awaitTermination() in production).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = suite.run(batch_df)
        (
            res.verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def streaming_window_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window stats stream (input: a readStream df).

    Event-time watermarks require TIMESTAMP (with local TZ); parquet NTZ
    timestamps are cast (session TZ is pinned UTC, so values are unchanged).
    """
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(value_col), 6).alias("avg_v"),
            F.round(F.min(value_col), 6).alias("min_v"),
            F.round(F.max(value_col), 6).alias("max_v"),
            F.round(F.stddev_samp(value_col), 6).alias("std_v"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n", "avg_v", "min_v", "max_v", "std_v",
        )
    )
