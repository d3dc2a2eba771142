"""Streaming CUSUM change-point monitor via applyInPandasWithState —
the streaming twin of the batch detector (``daily_revenue_cusum``,
workloads/w16): sequential detection is the family's NATURAL streaming
member, since Page's recurrence

    S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k))
    S⁻_t = max(0, S⁻_{t-1} + (μ − k − x_t))

needs exactly two integers of state per monitored key. The batch query
self-tunes (μ, k, h) from the full series and evaluates the recurrence
through the prefix identity S_t = P_t − min(0, min_{j≤t} P_j); the
streaming deployment FREEZES those parameters (the production
contract: tuned on a reference window, then monitored forward) and
folds the recurrence per micro-batch. The stream-vs-batch equality
test replays a chronological feed and pins that both forms — the
recurrence and the prefix identity — emit identical (s_pos, s_neg,
alarm) rows per day, in exact integer arithmetic.

Contract (the markov twin's append-only law): per-key rows must be
ingested time-ordered across micro-batches; within a batch the kernel
sorts. State is two longs per key in the state store; kernel work per
batch ∝ batch rows.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

CUSUM_SCHEMA = StructType(
    [
        StructField("skey", StringType()),
        StructField("day", StringType()),
        StructField("x_c", LongType()),
        StructField("s_pos_c", LongType()),
        StructField("s_neg_c", LongType()),
        StructField("alarm", LongType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_pos", LongType()),
        StructField("s_neg", LongType()),
    ]
)


def cusum_alarms_stream(
    series: DataFrame, mu_c: int, k_c: int, h_c: int
) -> DataFrame:
    """Per-day CUSUM rows from a streaming (skey, day, x_c) frame
    under FROZEN integer parameters (reference level ``mu_c``,
    allowance ``k_c``, alarm threshold ``h_c``, all in cents)."""
    mu_c, k_c, h_c = int(mu_c), int(k_c), int(h_c)

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("day")
        s_pos, s_neg = state.get if state.exists else (0, 0)
        out = []
        for day, x in zip(pdf["day"], pdf["x_c"]):
            x = int(x)
            s_pos = max(0, s_pos + (x - mu_c - k_c))
            s_neg = max(0, s_neg + (mu_c - k_c - x))
            out.append(
                (
                    key[0],
                    day,
                    x,
                    s_pos,
                    s_neg,
                    1 if (s_pos > h_c or s_neg > h_c) else 0,
                )
            )
        state.update((s_pos, s_neg))
        yield pd.DataFrame(
            out, columns=["skey", "day", "x_c", "s_pos_c", "s_neg_c", "alarm"]
        )

    return series.groupBy("skey").applyInPandasWithState(
        _update,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_alarms_batch(
    series: DataFrame, mu_c: int, k_c: int, h_c: int
) -> DataFrame:
    """Batch twin under the same frozen parameters, evaluated through
    Page's PREFIX IDENTITY (running sum − clamped running min — the
    registered daily_revenue_cusum shape) rather than the recurrence,
    so stream-equals-batch also re-proves the identity in integer
    arithmetic. One window partitioning by key serves every stage."""
    from pyspark.sql import Window

    mu_c, k_c, h_c = int(mu_c), int(k_c), int(h_c)
    w = Window.partitionBy("skey").orderBy("day")
    p = series.select(
        "skey",
        "day",
        "x_c",
        F.sum(F.col("x_c") - F.lit(mu_c + k_c)).over(w).alias("p_t"),
        F.sum(F.lit(mu_c - k_c) - F.col("x_c")).over(w).alias("q_t"),
    )
    s = p.select(
        "skey",
        "day",
        "x_c",
        (F.col("p_t") - F.least(F.lit(0), F.min("p_t").over(w)))
        .cast("bigint")
        .alias("s_pos_c"),
        (F.col("q_t") - F.least(F.lit(0), F.min("q_t").over(w)))
        .cast("bigint")
        .alias("s_neg_c"),
    )
    return s.select(
        "skey",
        "day",
        F.col("x_c").cast("bigint").alias("x_c"),
        "s_pos_c",
        "s_neg_c",
        ((F.col("s_pos_c") > h_c) | (F.col("s_neg_c") > h_c))
        .cast("bigint")
        .alias("alarm"),
    )
