from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hubsit_health_analytics_etl_spark.session import get_spark

    s = get_spark(app_name="hubsit-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
