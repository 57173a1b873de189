"""Table profiling → constraint suggestion (the Deequ ConstraintSuggestion
pattern — public design).

The reference hand-codes its constraints inside the detector scripts
(SURVEY.md §2.1 S6: a config dict of thresholds); a validation engine
onboarding a new 100 TB table needs the inverse: profile the table ONCE and
emit the constraint suite a human would have written — which then runs
through the ordinary CheckSuite machinery and the metric-history anomaly
layer.

Two passes, both bounded:

1. ``profile_columns`` — ONE hash-aggregate over the table (partial+final;
   only the profiled columns are read, Catalyst prunes the scan): per column
   n_nulls, distinct count (``approx_count_distinct`` HLL by default — the
   100 TB path; ``exact_distinct=True`` swaps in ``count(DISTINCT)`` where
   the suggestions must be exactly reproducible, e.g. the oracle gate), and
   min/max for numerics.
2. value-set collection — ``collect_set`` ONLY for the string columns whose
   profiled cardinality cleared the ``max_set_card`` gate, so driver memory
   is bounded by O(qualifying cols × max_set_card) regardless of table size.

Suggestion rules (each row cites its evidence):
- 0 nulls                      → not_null
- string, 1 ≤ distinct ≤ cap   → in_set(observed values)
- numeric                      → between(min − margin·range, max + margin·range)
- 0 nulls ∧ distinct == n_rows → unique

The suggested suite is SELF-CONSISTENT by construction: it passes on the
profiled table (pinned in tests/test_profile.py) and exists to catch the
NEXT ingest's regressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from al_drift_detection_spark import suite as S

NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

SUGGESTION_SCHEMA = (
    "column string, check string, lo double, hi double, values string, "
    "n_rows long, n_nulls long, n_distinct long"
)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    hll_rsd: float = 0.02,
) -> dict[str, dict]:
    """One aggregation pass → {column: profile dict}. Bounded driver
    round-trip: exactly one row comes back regardless of table size."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(fields)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col, hll_rsd)
            ).alias(f"{c}__distinct")
        )
        if isinstance(fields[c], NUMERIC_TYPES):
            aggs.append(F.min(col).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        out[c] = {
            "dtype": fields[c].simpleString(),
            "numeric": isinstance(fields[c], NUMERIC_TYPES),
            "n_rows": row["__n_rows"],
            "n_nulls": row[f"{c}__nulls"],
            "n_distinct": row[f"{c}__distinct"],
            "min": row[f"{c}__min"] if f"{c}__min" in row.asDict() else None,
            "max": row[f"{c}__max"] if f"{c}__max" in row.asDict() else None,
        }
    return out


def suggest_checks(
    df: DataFrame,
    columns: list[str] | None = None,
    max_set_card: int = 20,
    range_margin: float = 0.0,
    exact_distinct: bool = False,
) -> tuple[list[S.Check], list[tuple]]:
    """Profile → (suggested Check objects, suggestion evidence rows).

    Evidence rows follow SUGGESTION_SCHEMA; `values` is the sorted
    comma-joined observed set for in_set suggestions (bounded by the
    max_set_card gate BEFORE any collection happens)."""
    hll_rsd = 0.02
    prof = profile_columns(df, columns, exact_distinct=exact_distinct, hll_rsd=hll_rsd)

    # bounded second pass, ONE aggregate: value sets for gated string columns
    # + exact distinct confirmation for unique CANDIDATES (in approx mode the
    # HLL estimate never equals n_rows exactly, and a unique check suggested
    # off a wrong estimate would fail on the very table it was profiled from
    # — exactness only where a constraint depends on it, cost bounded to the
    # candidate columns)
    set_cols = [
        c
        for c, p in prof.items()
        if not p["numeric"]
        and p["dtype"] == "string"
        and 1 <= p["n_distinct"] <= max_set_card
    ]
    uniq_candidates = [
        c
        for c, p in prof.items()
        if p["n_nulls"] == 0
        and p["n_rows"] > 0
        and (
            p["n_distinct"] == p["n_rows"]
            if exact_distinct
            else p["n_distinct"] >= (1 - 3 * hll_rsd) * p["n_rows"]
        )
    ]
    value_sets: dict[str, list[str]] = {}
    second = [F.sort_array(F.collect_set(F.col(c))).alias(f"set__{c}") for c in set_cols]
    if not exact_distinct:
        second += [
            F.count_distinct(F.col(c)).alias(f"exact__{c}") for c in uniq_candidates
        ]
    if second:
        row = df.agg(*second).collect()[0]
        value_sets = {c: list(row[f"set__{c}"]) for c in set_cols}
        if not exact_distinct:
            uniq_candidates = [
                c for c in uniq_candidates if row[f"exact__{c}"] == prof[c]["n_rows"]
            ]
            for c in uniq_candidates:
                prof[c]["n_distinct"] = row[f"exact__{c}"]
    uniq_cols = set(uniq_candidates)

    checks: list[S.Check] = []
    rows: list[tuple] = []
    for c in sorted(prof):
        p = prof[c]
        base = (p["n_rows"], p["n_nulls"], p["n_distinct"])
        if p["n_nulls"] == 0 and p["n_rows"] > 0:
            checks.append(S.not_null(c))
            rows.append((c, "not_null", None, None, None, *base))
        if c in value_sets:
            vals = value_sets[c]
            checks.append(S.in_set(c, vals))
            rows.append((c, "in_set", None, None, ",".join(vals), *base))
        if p["numeric"] and p["min"] is not None:
            span = (p["max"] - p["min"]) * range_margin
            lo, hi = p["min"] - span, p["max"] + span
            checks.append(S.between(c, lo, hi))
            rows.append((c, "between", lo, hi, None, *base))
        if c in uniq_cols:
            checks.append(S.unique(c))
            rows.append((c, "unique", None, None, None, *base))
    return checks, rows


def suggestions_df(spark, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, SUGGESTION_SCHEMA)


def suggest_suite(
    df: DataFrame,
    part_col: str = "part",
    row_id_col: str | None = None,
    **kw,
) -> S.CheckSuite:
    """Profile the table and return a runnable CheckSuite of the suggested
    constraints (the onboarding entry point). Stat columns ride along so the
    suite also feeds the metrics repository: numerics = the between-suggested
    columns, ids = the unique-suggested ones. Serialize with
    suite.suite_to_config → the JSON the CLI's --suite flag loads."""
    checks, rows = suggest_checks(df, **kw)
    return suite_from_suggestions(checks, rows, part_col, row_id_col)


def suite_from_suggestions(
    checks: list[S.Check],
    rows: list[tuple],
    part_col: str = "part",
    row_id_col: str | None = None,
) -> S.CheckSuite:
    """Assemble the suite from an ALREADY-RUN suggest_checks result (callers
    that also persist the evidence rows avoid a second profiling pass)."""
    ids = {r[0] for r in rows if r[1] == "unique"}
    # a column can be both numeric and unique (a numeric key): the id list
    # wins — stats_pass would otherwise alias {c}__nulls twice in one agg
    nums = {r[0] for r in rows if r[1] == "between"} - ids
    return S.CheckSuite(
        checks=checks,
        part_col=part_col,
        row_id_col=row_id_col or part_col,
        numeric_stat_cols=sorted(nums),
        id_stat_cols=sorted(ids),
    )


def type_suggestions(
    df: DataFrame,
    cols: list[str] | None = None,
    threshold: float = 0.99,
) -> DataFrame:
    """Column TYPE suggestion for string columns (the schema-inference half
    of profiling — TFDV's inferred-schema / Deequ's suggestion layer, public
    designs): a feed that ships numbers or timestamps as strings loses
    every numeric constraint and kernel downstream, and onboarding should
    flag it. For each string column, ONE aggregate pass computes the parse
    rate of three candidate types over the column's NON-NULL values and
    suggests the highest-priority type clearing `threshold`:

    - bigint     — digits-only regexp '^[+-]?[0-9]+$'. A REGEXP, not
      try_cast: DuckDB's TRY_CAST rounds '48.35' to 48 while Spark's ANSI
      try_cast rejects it, so a cast-based rate is not engine-portable (and
      a decimal column should suggest double, not a rounding bigint cast).
    - double     — try_cast(double); supersedes nothing (ints also parse,
      which is why bigint is checked first).
    - timestamp  — try_cast(timestamp) GATED by a '^\\d{4}-\\d{2}-\\d{2}'
      prefix regexp: Spark parses bare '2026' as a year timestamp while
      DuckDB rejects it, and a column of small integers must never be
      suggested as timestamps anyway.

    Non-string columns are ignored (their types are already typed).
    Output: one row per inspected column —
    (column, n_non_null, int_rate, double_rate, timestamp_rate,
    suggested_type), rates un-rounded; suggested_type 'string' when nothing
    clears the threshold (keep as-is). Oracle twin: q_type_suggestions."""
    from pyspark.sql.types import StringType

    if cols is None:
        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    if not cols:
        raise ValueError("type_suggestions: no string columns to inspect")
    aggs = []
    for i, c in enumerate(cols):
        v = F.col(c)
        nn = v.isNotNull()
        aggs += [
            F.sum(nn.cast("long")).alias(f"_n_{i}"),
            F.avg(
                F.when(nn, v.rlike("^[+-]?[0-9]+$").cast("double"))
            ).alias(f"_i_{i}"),
            F.avg(
                F.when(nn, v.try_cast("double").isNotNull().cast("double"))
            ).alias(f"_d_{i}"),
            F.avg(
                F.when(
                    nn,
                    (
                        v.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}")
                        & v.try_cast("timestamp").isNotNull()
                    ).cast("double"),
                )
            ).alias(f"_t_{i}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        ir, dr, tr = F.col(f"_i_{i}"), F.col(f"_d_{i}"), F.col(f"_t_{i}")
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(f"_n_{i}"), F.lit(0)).alias("n_non_null"),
                F.coalesce(ir, F.lit(0.0)).alias("int_rate"),
                F.coalesce(dr, F.lit(0.0)).alias("double_rate"),
                F.coalesce(tr, F.lit(0.0)).alias("timestamp_rate"),
                F.when(ir >= threshold, "bigint")
                .when(dr >= threshold, "double")
                .when(tr >= threshold, "timestamp")
                .otherwise("string")
                .alias("suggested_type"),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("s")).select("s.*")
