"""Environment pin — catch silent runtime drift.

Round 5 went red because the box upgraded PySpark under unchanged code
(4.0.x → 4.1.2 made ``spark.sql.legacy.parquet.nanosAsLong`` inert, so
events.ts started loading as timestamp_ntz instead of bigint ns). This
test makes the next drift a single named failure instead of a scattered
red round. Supported matrix (documented in BASELINE.md "Environment"):

- PySpark 3.5–4.0: events.ts reads as bigint ns under nanosAsLong.
- PySpark 4.1:     nanosAsLong inert; events.ts reads as timestamp_ntz.

Both paths are normalized by sources/parquet.py load_table and
tests/conftest.py fix_event_ts; a NEW major.minor outside the matrix
needs those guards re-verified before the pin is extended.
"""

from __future__ import annotations

import pyspark

SUPPORTED = {(3, 5), (4, 0), (4, 1)}


def test_pyspark_version_in_supported_matrix():
    major, minor = (int(x) for x in pyspark.__version__.split(".")[:2])
    assert (major, minor) in SUPPORTED, (
        f"PySpark {pyspark.__version__} is outside the verified matrix "
        f"{sorted(SUPPORTED)} — re-verify the events.ts nanos handling "
        "(sources/parquet.py, tests/conftest.py fix_event_ts, "
        "streaming/windows.py _with_watermark) and extend SUPPORTED + "
        "BASELINE.md before bumping this pin."
    )


def test_events_ts_normalizes_to_ntz_micros(spark):
    """Whatever the raw read dtype (bigint ns on ≤4.0, timestamp_ntz on
    4.1+), load_table must surface events.ts as timestamp_ntz with µs
    values identical to DuckDB's ns→us cast."""
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    from .conftest import SF_SMOKE

    df = load_table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert df.where("ts IS NULL").count() == 0
