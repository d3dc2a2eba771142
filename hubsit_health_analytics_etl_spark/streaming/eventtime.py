"""Event-time type normalization shared by every watermarking operator.

Spark's streaming watermark requires TIMESTAMP (LTZ);
``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` rejects TIMESTAMP_NTZ. The
batch fixtures carry NTZ event time for cross-engine determinism, and
on Spark 4.1+ the TIMESTAMP(NANOS) parquet column loads natively as
NTZ (``nanosAsLong`` is inert there — see sources/parquet.py). Under
the engine's UTC session the NTZ→LTZ cast is the identity on
wall-clock values, so applying it lazily here makes every watermarking
operator accept either representation on any supported Spark version.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ensure_event_time_ltz(df: DataFrame, ts: str) -> DataFrame:
    """Cast a TIMESTAMP_NTZ event-time column to TIMESTAMP (LTZ) so
    ``withWatermark`` accepts it; any other dtype passes through."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        df = df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df
