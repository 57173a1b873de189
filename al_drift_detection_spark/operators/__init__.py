from al_drift_detection_spark.operators.registry import REGISTRY, QuerySpec  # noqa: F401
from al_drift_detection_spark.operators import registry_ml  # noqa: F401  (populates REGISTRY)
from al_drift_detection_spark.operators import registry_ext  # noqa: F401  (populates REGISTRY)
