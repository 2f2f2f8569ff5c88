from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from curator_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="curator-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()
