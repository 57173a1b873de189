"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship validation-flavoured aggregation on sf0.001;
queries()/oracle_sql() expose the full operator registry
(al_drift_detection_spark.operators) — one entry per implemented operator
from SURVEY.md §2 plus the training-data-pipeline operators. Oracle SQL is
DuckDB-dialect, value-identical (aliases + rounding match the Spark side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from al_drift_detection_spark.operators import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q_tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    # spec.sql may be a zero-arg builder (LAZY oracle — the IVF entries
    # derive their SQL from data-trained centroid literals; building at
    # import time would put parquet I/O on every package import). A builder
    # that fails (e.g. its sf_dir is absent in this environment) degrades
    # ONLY its own entry to rows-only rather than failing the whole dict.
    out: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if spec.sql is None:
            continue
        if callable(spec.sql):
            try:
                out[name] = spec.sql()
            except Exception as ex:  # noqa: BLE001 — degrade, don't abort
                import sys

                print(f"oracle_sql: lazy builder for {name} failed "
                      f"({ex}); entry degrades to rows-only", file=sys.stderr)
        else:
            out[name] = spec.sql
    return out
