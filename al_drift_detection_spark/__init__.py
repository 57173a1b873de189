"""al_drift_detection_spark — a from-scratch PySpark-native validation +
drift-detection engine with the query/data-processing capabilities of the
reference pipeline (epn-ml/AL-Drift-Detection, surveyed in SURVEY.md).

Design (SURVEY.md §7): a declarative CheckSuite compiles to a single-pass
DataFrame job per partition batch → column stats rows, constraint verdicts,
violation rows, and distribution-drift scores (KS / PSI / MMD-RBF), written to
partition-keyed checkpoint + metrics tables for idempotent resume.

Everything is public PySpark DataFrame API + vectorized pandas/Arrow UDFs —
no per-row Python UDFs, no custom Catalyst rules.
"""

__version__ = "0.1.0"

from al_drift_detection_spark.session import get_spark  # noqa: F401
