"""As-of (point-in-time) join — a custom operator Spark lacks.

``asof_join_backward(left, right, ...)`` attaches to every left row
the most recent right row with ``right_ts <= left_ts`` for the same
key (the temporal lookup behind feature stores, slowly-changing
prices, latest-reading-before-event).

Algorithm: the one-pass **union + running last_value** formulation —
tag both inputs, union them, sort within key by (ts, side) and carry
the right-side payload forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding running frame, then keep only left rows.

Why not a range join (`l.key = r.key AND r.ts <= l.ts` + pick max):
that's an O(|L|·|R|) per-key pair blow-up before the reduction. The
union form is one shuffle on the key and one sort — the same cost
class as a sort-merge join, and it degrades gracefully on skewed keys
(a hot key is one big sorted partition, not a quadratic pair set).

Ties: rights sort BEFORE lefts at equal ts (inclusive `<=`); supply
``dedup_right=True`` (default) to keep one right row per (key, ts)
(greatest ``tie_break`` wins) so results are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tie_break: str | None = None,
    dedup_right: bool = True,
) -> DataFrame:
    """Left rows + most recent right payload as of ``left_ts``.

    Output: all left columns + ``payload`` columns (null when no right
    row precedes the left row) + ``_asof_ts`` (the matched right ts).
    """
    if dedup_right:
        # a deterministic tie-break is mandatory: ordering a
        # (key, right_ts) partition by right_ts alone would make
        # row_number pick whichever row the shuffle delivered first
        tb = tie_break or payload[0]
        w_dedup = Window.partitionBy(key, right_ts).orderBy(F.col(tb).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    lcols = left.columns
    # The entire right payload (+ matched ts) rides in ONE struct so a
    # null payload column in the most recent right row cannot make
    # per-column last(ignorenulls) mix values from different right rows
    # — the struct is non-null whenever a right row exists, and it is
    # carried (or not) atomically.
    r_struct = F.struct(
        *[F.col(c).alias(c) for c in payload],
        F.col(right_ts).alias("_asof_ts"),
    )
    rtypes = dict(right.dtypes)
    null_struct = F.lit(None).cast(
        "struct<"
        + ",".join(
            [f"`{c}`:{rtypes[c]}" for c in payload]
            + [f"`_asof_ts`:{rtypes[right_ts]}"]
        )
        + ">"
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        null_struct.alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    unioned = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.last("_r", ignorenulls=True).over(w).alias("_r_carried"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col(f"_r_carried.{c}").alias(c) for c in payload],
            F.col("_r_carried._asof_ts").alias("_asof_ts"),
        )
    )
