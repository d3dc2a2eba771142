"""Range (interval) join — EXT, named by the training-pipeline brief.

``point ⋈ [start, end)`` joins are the workhorse of event-to-window
attribution (events into campaign/incident/session windows, prices
into validity periods). Spark plans a naive ``ts >= start AND ts <
end`` join as a BroadcastNestedLoopJoin (small right side) or a
CartesianProduct — O(|L|·|R|) row comparisons, the classic 100 TB
killer.

Scale-safe shape used here (the standard bucketized-range-join trick,
cf. the OSS range-join optimizations in Delta/Photon and Flink's
interval join): quantize time into fixed-width buckets; each LEFT
point belongs to exactly one bucket, each RIGHT interval explodes
into the ≤ ceil(len/width)+1 buckets it overlaps; equi-join on the
bucket id, then apply the exact range predicate. The join is a plain
hash/sort-merge equi-join — shuffle on the integer bucket key — and
the row blow-up is bounded by the interval-length/bucket-width ratio
(pick ``bucket_sec`` ≈ the typical interval length, so the factor
is ~2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

def _epoch_micros(col: str) -> F.Column:
    """Integer epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ
    columns (NTZ casts through LTZ in the session zone — UTC here,
    deterministic)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Inner-join left points (``ts_col``) to right intervals
    ``[start_col, end_col)`` (half-open: ts == end does NOT match).
    Intervals with ``end <= start`` are dropped (empty by the
    half-open contract). Inner only — anti/outer variants compose from
    the result (e.g. left_anti on the matched keys).

    The result carries all columns of both inputs (names must not
    collide — alias beforehand). Each matching (point, interval) pair
    is produced exactly once: a point lives in one bucket, and an
    interval's exploded bucket list is duplicate-free.
    """
    w_us = int(bucket_sec) * 1_000_000
    lb = left.withColumn(
        "_rj_bk", F.floor(_epoch_micros(ts_col) / w_us).cast("long")
    )
    s0 = F.floor(_epoch_micros(start_col) / w_us).cast("long")
    # end is exclusive: the last overlapped bucket holds end - 1µs
    s1 = F.floor((_epoch_micros(end_col) - 1) / w_us).cast("long")
    rb = (
        right.filter(F.col(end_col) > F.col(start_col))
        .withColumn("_rj_bks", F.sequence(s0, F.greatest(s0, s1)))
        .withColumn("_rj_bk", F.explode("_rj_bks"))
        .drop("_rj_bks")
    )
    out = lb.join(rb, "_rj_bk").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("_rj_bk")
