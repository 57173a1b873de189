from __future__ import annotations

import pytest

from al_drift_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="tests")
    yield s
