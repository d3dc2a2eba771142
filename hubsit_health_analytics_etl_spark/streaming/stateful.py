"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows (streaming/windows.py) cover time bucketing;
this is the escape hatch for semantics Spark's operators can't
express — here, a per-user running profile (event count, value sum,
last-seen timestamp) that emits an updated row per user per
micro-batch and expires idle users by processing-time timeout.

Scale notes: state is partitioned by the grouping key across
executors (RocksDB/HDFS state store in production); the pandas kernel
sees one key-group at a time via Arrow. Batch-mode twin provided for
oracle-style verification of the aggregation semantics.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("valor_total", DoubleType()),
        StructField("last_seen", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("valor_total", DoubleType()),
        StructField("last_seen", StringType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last = state.get if state.exists else (0, 0.0, "")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # explicit µs format: str(Timestamp) drops '.000000' on whole
        # seconds, which would break parity with the batch twin's
        # date_format(..., '.SSSSSS')
        mx = pdf["ts"].max().strftime("%Y-%m-%d %H:%M:%S.%f")
        last = max(last, mx)
    state.update((n, total, last))
    state.setTimeoutDuration(60 * 60 * 1000)  # expire idle users after 1h
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "valor_total": [round(total, 2)],
            "last_seen": [last],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile. ``events`` must be a
    streaming DataFrame with (user_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin with identical semantics over a bounded input —
    what the streaming state converges to after all events."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("valor_total"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_seen"),
    )
