"""Streaming deduplication — the streaming face of the batch dedup
family (operators/dedup.py), for ingest pipelines that must drop
duplicate records as they arrive (at-least-once sources: Kafka
redeliveries, file re-drops, retried producers).

The reference is strictly batch (no streaming surface at all —
/root/reference/src/etl_pipeline.py:692-712); this module is EXT,
required by the training-data-pipeline brief.

Scale design: ``dropDuplicatesWithinWatermark`` keeps per-key state
ONLY until the watermark passes the key's event time, so state size is
bounded by (arrival rate × watermark horizon) — a plain
``dropDuplicates`` on a stream retains every key forever and OOMs a
100 TB/day ingest. Dedup state shuffles on the key; the key should be
the short fingerprint, never the document body.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.textanalysis import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str,
) -> DataFrame:
    """First-arrival-wins dedup on ``key_cols`` with bounded state:
    duplicates arriving within the watermark horizon of the original
    are dropped; state for keys older than the watermark is evicted.

    Works on a batch DataFrame too, so batch backfills and the live
    stream share one code path. The batch fallback keeps the EARLIEST
    ``ts_col`` row per key (ties broken by a whole-row hash — a pure
    function of the data): plain ``dropDuplicates`` keeps an arbitrary
    partition-order winner, which would make a backfilled corpus
    disagree with the live stream's first-arrival-wins on which
    representative row survived.

    Parity contract under OUT-OF-ORDER arrival: only the surviving KEY
    SET is stream/batch identical. The stream keeps the first-ARRIVAL
    row, the batch keeps the earliest-EVENT-TIME row — when a late row
    carries an earlier event time than an already-kept duplicate, the
    two paths keep different representative rows for the same key.
    With in-order input (arrival order == event-time order) the winners
    coincide, which is what the parity test pins.
    """
    if not stream.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(
            F.col(ts_col).asc(), F.xxhash64(*stream.columns).asc()
        )
        return (
            stream.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    from .eventtime import ensure_event_time_ltz

    return (
        ensure_event_time_ltz(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def streaming_dedup_by_fingerprint(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content-addressed streaming dedup: key = md5 fingerprint of the
    whitespace/case-normalized text (operators.textanalysis.fingerprint
    — the same key the batch exact_dedup groups on), so re-submitted
    documents with cosmetic spacing/case differences still collapse.
    The 32-char key, not the document body, is what the dedup state
    stores and shuffles on."""
    with_fp = stream.withColumn("fp", fingerprint(text_col))
    return streaming_exact_dedup(with_fp, ["fp"], ts_col, watermark)
