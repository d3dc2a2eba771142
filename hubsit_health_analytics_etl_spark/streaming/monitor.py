"""Streaming-query health monitor — the numbers an on-call reads.

`pyspark.sql.streaming.StreamingQuery.lastProgress` is a deep nested
dict per micro-batch; at 3am what matters is five numbers: are rows
flowing, is processing keeping up with input, how much state has
accumulated, how far the watermark has advanced, and is the batch
duration trending toward the trigger interval (the back-pressure
cliff). `query_health` flattens exactly those, `state_pressure`
summarizes the stateful operators — both safe to call on a query that
has not produced progress yet (all-None result, never a crash).

Batch-side observability twin: `pyspark.sql.Observation` metrics on
the dedup cap drops (operators/dedup.py). No reference counterpart
(the pandas script has no runtime to monitor).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def query_health(query: StreamingQuery) -> dict[str, Any]:
    """Five-number health summary of the LAST micro-batch (None fields
    until the first progress event)."""
    p = query.lastProgress
    if not p:
        return {
            "batch_id": None,
            "input_rows_per_sec": None,
            "processed_rows_per_sec": None,
            "batch_duration_ms": None,
            "watermark": None,
        }
    return {
        "batch_id": p.get("batchId"),
        "input_rows_per_sec": p.get("inputRowsPerSecond"),
        "processed_rows_per_sec": p.get("processedRowsPerSecond"),
        "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def state_pressure(query: StreamingQuery) -> dict[str, Any]:
    """Aggregate state-store pressure across the query's stateful
    operators: total/updated rows and state memory. Growth of
    ``state_rows`` across batches without matching eviction is the
    unbounded-state leak every watermarkless aggregation has."""
    p = query.lastProgress
    ops = (p or {}).get("stateOperators") or []
    if not ops:
        return {"n_state_operators": 0, "state_rows": None, "state_bytes": None}
    return {
        "n_state_operators": len(ops),
        "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
        "state_bytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
    }
