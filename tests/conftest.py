from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from fundus_spark.plans import build_session

    session = build_session(app_name="fundus-spark-tests", cores=4, shuffle_partitions=8)
    yield session
    session.stop()
