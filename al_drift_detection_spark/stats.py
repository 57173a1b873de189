"""Single-pass per-partition column statistics (SURVEY.md §2.4 A13).

The reference computes global mean/std eagerly in pandas
(/root/reference/gan.py:631-634) and has no other stats machinery; the target
generalizes this to ONE hash-aggregate pass per partition batch computing, for
every configured column: row/null counts, min/max/mean/sample-stddev,
t-digest-style quantiles (`approx_percentile`) and HyperLogLog uniqueness
(`approx_count_distinct`).

Scale notes (100 TB):
- one `groupBy(part).agg(...)` = map-side partial aggregation + one shuffle of
  tiny sketch rows (`treeAggregate` semantics for free via partial+final hash
  agg) — never a shuffle of raw data;
- only referenced columns are read (Catalyst column pruning pushes the
  projection into the parquet/Iceberg scan);
- output is O(parts × columns) rows — negligible, safe to checkpoint.

The global roll-up is computed FROM the per-partition rows (count-weighted
moments), not by re-scanning raw data — which keeps resume-from-checkpoint
free of double counting (SURVEY.md §7 hard part (e)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANTILES = (0.25, 0.5, 0.75)


def stats_pass(
    df: DataFrame,
    numeric_cols: list[str],
    id_cols: list[str] | None = None,
    part_col: str = "part",
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
    hll_rsd: float = 0.02,
) -> DataFrame:
    """One aggregation pass → wide per-partition stats row.

    Columns out: part, n_rows, then per numeric column c:
    ``{c}__nulls, {c}__min, {c}__max, {c}__avg, {c}__std, {c}__q{qq}``,
    and per id column: ``{c}__nulls, {c}__approx_distinct``.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.avg(col).alias(f"{c}__avg"),
            F.stddev_samp(col).alias(f"{c}__std"),
        ]
        for q in quantiles:
            aggs.append(
                F.percentile_approx(col.cast("double"), F.lit(q), F.lit(10000)).alias(
                    f"{c}__q{int(q * 100):02d}"
                )
            )
    for c in id_cols or []:
        col = F.col(c)
        aggs += [
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"),
            F.approx_count_distinct(col, hll_rsd).cast("double").alias(f"{c}__approx_distinct"),
        ]
    return df.groupBy(part_col).agg(*aggs)


def melt_stats(wide: DataFrame, part_col: str = "part") -> DataFrame:
    """Wide stats row → long metrics rows (part, column, metric, value).

    This is the `metrics` output contract (FIXTURES.md §4), the structured
    replacement for the reference's fsync'd text log rows
    (/root/reference/util.py:8-23).
    """
    pairs = []
    for field in wide.schema.fields:
        if field.name in (part_col, "n_rows"):
            continue
        col_name, metric = field.name.split("__", 1)
        pairs.append((field.name, col_name, metric))
    stack_args = ", ".join(f"'{c}', '{m}', cast(`{f}` as double)" for f, c, m in pairs)
    n = len(pairs)
    long = wide.selectExpr(
        part_col,
        "n_rows",
        f"stack({n}, {stack_args}) as (column, metric, value)",
    )
    # n_rows itself as a metric row per partition
    n_rows_rows = wide.select(
        part_col,
        "n_rows",
        F.lit("*").alias("column"),
        F.lit("n_rows").alias("metric"),
        F.col("n_rows").cast("double").alias("value"),
    )
    return long.unionByName(n_rows_rows)


def global_rollup(per_part: DataFrame, numeric_cols: list[str], part_col: str = "part") -> DataFrame:
    """Global min/max/avg/std from per-partition stats rows — no raw re-scan.

    Combines count-weighted first/second moments:
    E[x] = Σ nᵢμᵢ / Σ nᵢ ;  E[x²] via per-part (varᵢ·(nᵢ−1)/nᵢ + μᵢ²).
    Quantile/HLL sketches are NOT mergeable from these scalar outputs; global
    quantiles/uniqueness come from a direct ungrouped `stats_pass` when needed.
    """
    rows = []
    for c in numeric_cols:
        nn = F.col("n_rows") - F.col(f"{c}__nulls")
        mu = F.col(f"{c}__avg")
        var = F.coalesce(F.col(f"{c}__std") ** 2, F.lit(0.0))
        ex2 = (var * (nn - 1) / nn + mu**2) * nn  # Σ x² per part
        rows.append(
            per_part.agg(
                F.lit(c).alias("column"),
                F.min(f"{c}__min").alias("min"),
                F.max(f"{c}__max").alias("max"),
                (F.sum(mu * nn) / F.sum(nn)).alias("avg"),
                F.sum(nn).cast("long").alias("n"),
                F.sum(ex2).alias("_sum_x2"),
                F.sum(f"{c}__nulls").cast("long").alias("nulls"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    # sample variance from merged moments: (Σx² − n·μ²)/(n−1)
    return out.withColumn(
        "std",
        F.sqrt(
            F.greatest(
                (F.col("_sum_x2") - F.col("n") * F.col("avg") ** 2) / (F.col("n") - 1),
                F.lit(0.0),
            )
        ),
    ).drop("_sum_x2")
