"""Count-min sketch (CMS) approximate counting — the point-query sibling of
the Misra-Gries frequent-items analyzer (functions/frequent.py): MG answers
"WHICH keys are frequent" within its deterministic error band; a CMS answers
"how often did THIS key occur" for ANY key, from a fixed-size summary, with
the one-sided guarantee est >= true and est <= true + ceil(e/width * N) with
probability 1 - exp(-depth). At 10^12 rows an exact per-key count of a
high-cardinality column shuffles every key every time someone asks; the CMS
folds each window into at most depth x min(n, width) cells once, and every
later point query touches only the cells (Cormode & Muthukrishnan 2005,
"An improved data stream summary: the count-min sketch and its
applications" — public algorithm).

Spark-first shape (no UDF anywhere): the bucket row of a key under hash row
r is `pmod(xxhash64(key, lit(r)), width)` — a pure JVM expression — so the
sketch build is ONE posexplode fan-out (depth rows per input row, collapsed
map-side by partial aggregation to at most depth x width cells per
partition) into ONE groupBy. Cells are kept SPARSE ((r, bucket, cnt) rows,
absent = 0): mergeable by plain summation, which makes the sketch a drop-in
tenant of the snapshot-store protocol (functions/stores.py — incremental
ingests append only their own rows; compaction sums cells losslessly).

Everything is deterministic given the data: xxhash64 is seeded and
operators/xxh64_replica.py reproduces it bit-exactly in numpy, so the
q_cms_point_estimates DuckDB oracle value-checks the WHOLE pipeline (build,
merge, probe, min-over-rows, and the est-vs-exact overcount) by embedding
the key->bucket mapping as SQL literals — the q_ivf_topk lazy-oracle
technique. SURVEY.md §2.4 (A3 value counts — the approximate, mergeable
twin; A13 one-pass sketches); reference analog: the bounded per-window
summaries the detector keeps instead of raw history
(/root/reference/gan.py:400-413).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket_array(col: str, depth: int, width: int):
    """Array of the key's bucket under each of the `depth` hash rows —
    row r uses xxhash64(key, lit(r)): Spark chains the seed column-wise
    from 42, so each literal r yields an independent hash row (replicated
    bit-exactly by operators/xxh64_replica.xxhash64_long_int; parity
    pinned in tests/test_cms.py)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(r)), F.lit(width)).cast("int")
            for r in range(depth)
        ]
    )


def cms_cells(
    df: DataFrame,
    col: str,
    window_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """One sparse CMS per window: (window_col, r, bucket, cnt) rows, at most
    depth x min(n_distinct, width) per window. ONE partial+final aggregate
    pass — the posexplode fans each row into `depth` (r, bucket) updates,
    and hash-aggregate partials collapse them map-side, so shuffle volume is
    bounded by depth x width per (partition x window), independent of row
    count. NULL keys are excluded (count(col) semantics — the same
    null-parity posture as the HLL sketches)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            window_col,
            F.posexplode(_bucket_array(col, depth, width)).alias("r", "bucket"),
        )
        .groupBy(window_col, "r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    cells: DataFrame,
    keys_df: DataFrame,
    col: str,
    window_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Per-(window, key) count estimates from the CELLS alone (the raw data
    is never touched): est = min over hash rows of the key's cell, absent
    cells = 0 — the classic CMS point query, so est >= true count always
    (every occurrence of the key incremented every one of its cells) and
    overcounts only by colliding keys.

    Scale shape: every frame here is already aggregated — the probe grid is
    O(windows x keys x depth) and the merged cells O(windows x depth x
    width); the join on (window, r, bucket) is between two bounded
    summaries, never the raw data (AQE picks broadcast for whichever side
    is small; neither grows with row count). The left join keeps the grid's
    zero rows: an absent cell means no colliding key ever touched it, so
    the row min — and the estimate — is 0. Cells may carry duplicate
    (window, r, bucket) rows (multiple store snapshots); they are summed
    first, which IS the CMS merge. Output: (window_col, col, est:long).

    `cells` is consumed ONCE: the merged depth×width summary is persisted
    and BOTH the probe grid's window list and the estimate join fold from
    it — a live cells pipeline (raw scan + posexplode + aggregate) would
    otherwise execute twice per call (VERDICT r7 "What's wrong" #1; single
    execution pinned by tests/test_cms.py). The persisted child is attached
    to the output (functions._persist contract) — callers release after
    materializing."""
    from al_drift_detection_spark.functions._persist import attach_persisted

    merged = cells.groupBy(window_col, "r", "bucket").agg(
        F.sum("cnt").alias("cnt")
    ).persist()
    probes = keys_df.select(
        col, F.posexplode(_bucket_array(col, depth, width)).alias("r", "bucket")
    )
    grid = merged.select(window_col).distinct().crossJoin(F.broadcast(probes))
    out = (
        grid.join(merged, [window_col, "r", "bucket"], "left")
        .groupBy(window_col, col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )
    return attach_persisted(out, merged)


def update_cms_store(
    df_new: DataFrame,
    store_path: str,
    col: str,
    window_col: str,
    snapshot_id: int,
    depth: int = 3,
    width: int = 256,
) -> None:
    """Append one ingest's per-window cells to the persisted store — sketch
    ONLY the new rows, append O(windows x depth x width) cell rows.
    Idempotent per snapshot_id (dynamic-partition overwrite — the crash-
    retry contract every snapshot store uses)."""
    (
        cms_cells(df_new, col, window_col, depth=depth, width=width)
        .withColumn("_snapshot", F.lit(int(snapshot_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_snapshot")
        .parquet(store_path)
    )


def compact_cms_store(
    spark: SparkSession, store_path: str, window_col: str, keep_last: int = 1
) -> int | None:
    """Bound the store: merge all but the newest `keep_last` snapshots by
    summing cells — the CMS merge is exactly the fold every read performs,
    so answers are identical before/after (tests/test_cms.py)."""
    from al_drift_detection_spark.functions.stores import compact_snapshot_store

    def merge(rows: DataFrame) -> DataFrame:
        return rows.groupBy(window_col, "r", "bucket").agg(
            F.sum("cnt").alias("cnt")
        )

    return compact_snapshot_store(spark, store_path, merge, keep_last=keep_last)


def store_cms_estimates(
    spark: SparkSession,
    store_path: str,
    keys_df: DataFrame,
    col: str,
    window_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point estimates answered from the STORE'S committed view alone
    (merged compaction rows + live snapshots) — no raw data read."""
    from al_drift_detection_spark.functions.stores import read_snapshot_store

    if not os.path.exists(store_path):
        raise FileNotFoundError(store_path)
    st = read_snapshot_store(spark, store_path)
    if st is None:
        raise FileNotFoundError(f"{store_path}: no committed snapshots")
    return cms_point_estimates(
        st.drop("_snapshot"), keys_df, col, window_col, depth=depth, width=width
    )
