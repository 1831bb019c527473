from __future__ import annotations

import pytest

from hdfs_anomaly_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=4, shuffle_partitions=8, app_name="pytest-validation")
    yield s
    s.stop()
