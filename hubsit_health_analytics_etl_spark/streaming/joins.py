"""Stream-stream joins — the last §2.7 capability: correlating two
live event streams (click↔purchase attribution, request↔response
latency pairing) keyed by id within a bounded event-time interval.

Spark buffers BOTH sides in state; the join is tractable only because
the time-range condition + watermarks bound how long a row can wait
for its match — without them state grows forever. The builder emits
the canonical shape:

    left.ts  ∈ [right.ts + lower, right.ts + upper]

so state for a row is droppable once the other stream's watermark
passes its interval end.

The SAME builder runs on batch DataFrames (watermarks are no-ops in
batch), which is how the semantics are verified: availableNow
streaming output == the batch join on identical input.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Equi-join on ``keys`` with the event-time band
    ``right_ts + lower <= left_ts <= right_ts + upper`` (both bounds
    inclusive). On streaming inputs both sides get ``watermark``, which
    is what lets Spark evict join state (a right row is dead once the
    left watermark passes ``right_ts + upper``). ``left_ts`` and
    ``right_ts`` must be distinct column names (alias beforehand).

    Both inputs are aliased internally so the key equality is
    lineage-independent: when left and right derive from the SAME
    DataFrame (common in batch verification), ``left[k] == right[k]``
    resolves both sides to one attribute — a trivially-true comparison
    that silently degrades the equi-join to the time band alone."""
    if left.isStreaming or right.isStreaming:
        from .eventtime import ensure_event_time_ltz

        left = ensure_event_time_ltz(left, left_ts).withWatermark(left_ts, watermark)
        right = ensure_event_time_ltz(right, right_ts).withWatermark(
            right_ts, watermark
        )
    lft, rgt = left.alias("__ij_l"), right.alias("__ij_r")
    band = (
        (F.col(left_ts) >= F.col(right_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(left_ts) <= F.col(right_ts) + F.expr(f"INTERVAL {upper}"))
    )
    cond = band
    for k in keys:
        cond = (F.col(f"__ij_l.{k}") == F.col(f"__ij_r.{k}")) & cond
    return lft.join(rgt, cond).drop(*[rgt[k] for k in keys])
