from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def fix_event_ts(df, col: str = "ts"):
    """Normalize events.ts to TIMESTAMP (LTZ) across Spark versions.

    events.parquet stores TIMESTAMP(NANOS). Spark ≤4.0 with
    ``spark.sql.legacy.parquet.nanosAsLong`` reads it as ``bigint`` ns;
    Spark 4.1+ ignores that conf and reads ``timestamp_ntz`` natively.
    Streaming watermarks require TIMESTAMP (LTZ), so convert either
    representation (session tz is UTC → the NTZ→LTZ cast is the
    identity on wall-clock values and stays deterministic)."""
    import pyspark.sql.functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


@pytest.fixture(scope="session")
def spark():
    from hubsit_health_analytics_etl_spark.session import get_spark

    s = get_spark(app_name="hubsit-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
