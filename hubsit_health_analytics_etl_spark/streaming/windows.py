"""Time-window aggregation — SURVEY.md §2.7 EXT.

The reference is strictly batch (no windows, no watermarks, no state —
/root/reference/src/etl_pipeline.py:692-712 is a single main()). These
builders express tumbling / sliding / session aggregation with
``F.window`` / ``F.session_window``: the SAME code runs in batch
(DuckDB-verifiable) and under Structured Streaming — pass a streaming
DataFrame and a ``watermark`` and the plan becomes a stateful
streaming agg with late-data handling.

NB: Spark's streaming watermark requires TIMESTAMP (with local tz);
TIMESTAMP_NTZ event time is batch-only. The batch fixtures use NTZ for
cross-engine determinism; when a ``watermark`` is requested on an NTZ
event-time column, ``_with_watermark`` casts it to LTZ (identity under
the engine's UTC session), so the same builder works on Spark ≤4.0
(bigint-ns fixtures) and 4.1+ (native NTZ reads) — see
tests/test_streaming.py and tests/conftest.py fix_event_ts.

Scale notes: windowed aggregation shuffles on (key, window) — at
100 TB the input should be partitioned by event date so partition
pruning bounds each trigger/batch; sliding windows multiply rows by
(window/slide), so keep that ratio small and pre-filter columns.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _with_watermark(df: DataFrame, ts: str, watermark: str | None) -> DataFrame:
    if not watermark:
        return df
    from .eventtime import ensure_event_time_ltz

    return ensure_event_time_ltz(df, ts).withWatermark(ts, watermark)


def tumbling_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows, epoch-aligned. Output has
    window_start/window_end as formatted strings (cross-engine-stable)."""
    w = F.window(F.col(ts), duration)
    out = (
        _with_watermark(df, ts, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows
    (Catalyst expands rows — keep the ratio small at scale)."""
    w = F.window(F.col(ts), duration, slide)
    out = (
        _with_watermark(df, ts, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into
    one session per key (F.session_window — the streaming-native
    stateful op; in batch it's a sort-within-key + merge).

    Output exposes session_start/session_end as min/max event time
    strings (µs precision) — engine-portable, unlike the struct's
    half-open end (= last event + gap)."""
    w = F.session_window(F.col(ts), gap)
    out = (
        _with_watermark(df, ts, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(
            F.date_format(F.min(ts), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.max(ts), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            *aggs,
        )
    )
    return out.drop("w")
