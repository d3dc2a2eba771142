"""Count-min sketch: fixed-size frequency estimation for heavy-hitter
mining over unbounded key streams.

Why a sketch when ``GROUP BY key`` gives exact counts: the exact
aggregate's state is proportional to the number of DISTINCT keys — at
100 TB of events that is a full shuffle of the key space and an
aggregation hash table that can spill. The count-min sketch replaces
it with a constant-size depth×width counter grid that is MERGEABLE
(counter grids add elementwise), so every task reduces its partition
to depth×width rows map-side and the shuffle carries only
``tasks × depth × width`` counters, independent of both row count and
key cardinality — the same posture as the HLL distinct-count index
(operators/aggregate.py::hll_sketch_index) but for frequencies.

Estimates are biased UP (collisions only ever add), so
``estimate ≥ true count`` always, with the classic
(Cormode & Muthukrishnan 2005) guarantee
``estimate ≤ true + ε·N`` w.p. 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Engine-portable determinism: the d row-hash functions are the repo's
md5-integer convention (Spark ``conv(substr(md5(..),1,8),16,10)`` ==
DuckDB ``CAST('0x'||substr(md5(..),1,8) AS BIGINT)``, see
operators/sampling.py::hash_bucket), salted with the row index — so
the DuckDB oracle rebuilds the *identical* sketch and the comparison
is exact-integer, no tolerance.

Reference scope: the pandas reference has no sketching (it
``value_counts()``s 60k-row frames in memory,
/root/reference/src/etl_pipeline.py:381); this is part of the
beyond-reference scale surface like the HLL index.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CMS_DEPTH = 4
CMS_WIDTH = 32


def cms_bucket_sql(key: str, row: str, width: int = CMS_WIDTH) -> str:
    """SQL text for row-``row``'s bucket of ``key`` — built as text so
    the Spark expression and the DuckDB oracle stay byte-comparable.
    ``key``/``row`` are column names or SQL expressions."""
    return (
        f"cast(conv(substr(md5(concat('cms', cast({row} as string), '|', "
        f"cast({key} as string))), 1, 8), 16, 10) as bigint) % {width}"
    )


def duckdb_cms_bucket_sql(key: str, row: str, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of cms_bucket_sql (identical md5 input bytes)."""
    return (
        f"(CAST('0x' || substr(md5('cms' || CAST({row} AS VARCHAR) || '|' || "
        f"CAST({key} AS VARCHAR)), 1, 8) AS BIGINT) % {width})"
    )


def cms_counters(
    df: DataFrame, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch: one row per (row_i, bucket) with its counter.

    Each input row fans out to ``depth`` (row_i, bucket) cells via
    inline_outer over a literal struct array — a map-side explode with
    NO shuffle of the key space; the groupBy then partial-aggregates
    every task down to ≤ depth×width rows before the (tiny, fixed-size)
    exchange. Output ≤ depth×width rows total.
    """
    cells = F.expr(
        "inline(array("
        + ", ".join(
            f"struct(cast({i} as int) as row_i, "
            f"{cms_bucket_sql(key, str(i), width)} as bucket)"
            for i in range(depth)
        )
        + "))"
    )
    return (
        df.select(F.col(key), cells)
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_forget_grid(
    grid: DataFrame,
    deleted: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Right-to-be-forgotten for a standing sketch: the additive merge
    law run BACKWARDS — sketch the deleted slice (cost ∝ slice), negate
    its grid, sum elementwise, drop zeroed cells. Because counter
    grids are exact integer sums over disjoint slices, the result is
    row-identical to rebuilding the grid from the kept stream (pinned
    by the cms_forget oracle and a crafted-corpus test) — no other
    index family's forget is this cheap: no row deletes, no
    re-derivation, just one ≤ 2·depth·width-row aggregate."""
    neg = cms_counters(deleted, key, depth, width).withColumn(
        "c", (-F.col("c")).cast("bigint")
    )
    return (
        grid.unionByName(neg)
        .groupBy("row_i", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
        .filter(F.col("c") > 0)
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Probe the sketch: estimated count per key = min over the depth
    rows of the key's counter cell. ``counters`` is ≤ depth×width rows
    — always broadcast, so the probe is a map-side hash join + a
    per-key min (partial-aggregated): no shuffle proportional to the
    sketch. LEFT join + coalesce-0: a candidate whose cell is empty
    (a key the stream never produced) must estimate via min(..., 0)
    = 0 — an inner join would silently overestimate it from its
    non-empty cells, or drop it entirely."""
    probes = keys.select(
        F.col(key),
        F.expr(
            "inline(array("
            + ", ".join(
                f"struct(cast({i} as int) as row_i, "
                f"{cms_bucket_sql(key, str(i), width)} as bucket)"
                for i in range(depth)
            )
            + "))"
        ),
    )
    return (
        probes.join(F.broadcast(counters), ["row_i", "bucket"], "left")
        .select(key, F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .groupBy(key)
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )
