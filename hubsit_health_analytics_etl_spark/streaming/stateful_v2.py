"""Custom stateful streaming via transformWithStateInPandas — the
Spark 4 arbitrary-state API (SPARK-49564 "state v2") that supersedes
applyInPandasWithState (streaming/stateful.py keeps the v1 twin).

Why it matters at scale: v2 state lives in named, schema'd slots
(ValueState/ListState/MapState) inside the RocksDB state store —
incrementally checkpointed, queryable offline via the state data
source, and evolvable per slot — where v1 serializes one opaque tuple
per key. Same semantics implemented on both APIs lets a pipeline
migrate operator-by-operator.

The operator itself is the same per-user running profile as v1
(event count, value sum, last-seen event time) so the two APIs are
verified against ONE batch twin: user_profile_batch from stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import PROFILE_SCHEMA, STATE_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def state_v2_available() -> bool:
    """transformWithStateInPandas' Python worker speaks the state
    protocol over protobuf; without the ``protobuf`` package the
    worker crashes at init (observed: STREAMING_PYTHON_RUNNER_
    INITIALIZATION_FAILURE). Gate callers on this instead."""
    import importlib.util

    try:
        # find_spec on a dotted name imports the parent package first
        # and raises when even 'google' is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


class UserProfileProcessor(StatefulProcessor):
    """Per-user running (n_events, valor_total, last_seen) in a
    ValueState slot; emits the updated profile row each micro-batch
    (same contract as stateful._update_profile)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._state.get() if self._state.exists() else None
        n, total, last = prev if prev is not None else (0, 0.0, "")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # explicit µs format — str(Timestamp) drops '.000000' on
            # whole seconds (same parity note as the v1 kernel)
            mx = pdf["ts"].max().strftime("%Y-%m-%d %H:%M:%S.%f")
            last = max(last, mx)
        self._state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "valor_total": [round(total, 2)],
                "last_seen": [last],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream_v2(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile on the v2 API. ``events``
    must be a streaming DataFrame with (user_id, ts, value); the
    session must use the RocksDB state store provider
    (``ROCKSDB_PROVIDER``) — state v2 requires it. Fails loudly when
    the protobuf dependency is absent rather than crashing the
    streaming Python worker mid-query."""
    if not state_v2_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(its Python worker speaks the state protocol over protobuf); "
            "install it or use streaming.stateful.user_profile_stream "
            "(the applyInPandasWithState v1 twin, identical semantics)."
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
