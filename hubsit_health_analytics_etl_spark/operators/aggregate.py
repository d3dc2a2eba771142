"""Conditional-aggregation kernel — SURVEY.md §2.5 (the single most
important reference pattern).

Every reference group-by aggregates with per-group Python lambdas —
e.g. `('Status_Consolidado', lambda x: (x == 'ATENDIDO').sum())`
(/root/reference/src/etl_pipeline.py:478-480,493-496,514-517,535-539,
631-634). The distributed-safe translation is `sum(when(cond, x))`:
Catalyst splits it into partial (map-side) + final aggregation
automatically, so the shuffle carries one partial aggregate per
(group, metric), not raw rows — this is what makes the pattern hold at
100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def count_if(cond: Column) -> Column:
    """COUNT rows matching ``cond`` → long (0 for empty groups, like
    the reference's boolean .sum())."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def sum_if(col: Column | str, cond: Column, otherwise: float = 0.0) -> Column:
    """SUM of ``col`` over rows matching ``cond`` — the A4 pattern
    (etl_pipeline.py:537-539), stated by intent instead of the
    reference's index-aligned cross-filter lambdas."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.when(cond, c).otherwise(F.lit(otherwise)))


def avg_if(col: Column | str, cond: Column) -> Column:
    """AVG of ``col`` over rows matching ``cond`` (non-matching rows
    excluded, not zero-filled)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.avg(F.when(cond, c))


def approx_distinct(
    df: "DataFrame", keys: list[str], col: str, rsd: float = 0.02
) -> "DataFrame":
    """Approximate distinct count per key group (HyperLogLog++,
    ``approx_count_distinct``) — the constant-memory cardinality
    primitive at 100 TB: an EXACT count-distinct shuffles every
    distinct value to its reducer, while HLL sketches merge map-side
    in a few KB per group regardless of cardinality.

    Deliberately NOT an oracle-checked workload query: sketch
    estimates are engine- and implementation-specific, so cross-engine
    hash equality is impossible by construction. Accuracy is asserted
    against exact counts (within a multiple of ``rsd``) in
    tests/test_ext_operators.py instead."""
    import pyspark.sql.functions as F2

    return df.groupBy(*keys).agg(
        F2.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}")
    )


def approx_quantiles(
    df: "DataFrame", keys: list[str], col: str, probs: list[float], accuracy: int = 10_000
) -> "DataFrame":
    """Approximate per-group quantiles (``percentile_approx``,
    Greenwald-Khanna style sketch): mergeable fixed-size state instead
    of the full sort an exact percentile needs. Same non-oracle
    rationale as :func:`approx_distinct`; bounded-error tested."""
    import pyspark.sql.functions as F2

    return df.groupBy(*keys).agg(
        F2.percentile_approx(col, probs, accuracy).alias(f"approx_q_{col}")
    )


def hll_sketch_index(df, keys: list[str], col: str):
    """Per-key HyperLogLog sketch frame (key..., hll binary) — the
    MERGEABLE distinct-count index. Unlike approx_distinct's scalar,
    the sketch itself is the persisted state: each ingest sketches
    only its batch, `merge_hll_indexes` unions the binaries, and the
    estimate never re-reads raw data. KB of state per key vs a full
    distinct shuffle — the same incremental posture as the vocabulary
    and MinHash signature indexes (datasketches HLL, Spark 3.5+)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col).alias("hll"))


def merge_hll_indexes(*indexes):
    """Union per-key sketch frames from N ingests into one index:
    union-all + one hll_union_agg groupBy — rows ∝ Σ|keys|, never the
    raw data. Estimates come from hll_sketch_estimate over the merged
    binary."""
    out = indexes[0]
    for idx in indexes[1:]:
        out = out.unionByName(idx)
    keys = [c for c in out.columns if c != "hll"]
    return out.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimate(index):
    """(key..., n_distinct) from a sketch index."""
    keys = [c for c in index.columns if c != "hll"]
    return index.select(
        *keys, F.hll_sketch_estimate("hll").alias("n_distinct")
    )


def hll_forget_rebuild(index, kept_affected, affected_parts, part_col: str, keys: list[str], col: str):
    """Right-to-be-forgotten for the HLL index — the one sketch family
    with NO algebraic inverse (HLL registers are max-merged: a value's
    contribution cannot be subtracted out, unlike the CMS grid /
    histogram / moments integer sums). The certified contract is
    therefore a PARTITION-SCOPED REBUILD: the standing index keeps one
    sketch per (ingest-partition, key...) — exactly what per-batch
    ingest via hll_sketch_index already produces — and forgetting rows
    rebuilds ONLY the affected partitions' sketches from their kept
    rows, splicing them over the old rows. Cost ∝ kept rows of the
    partitions that lost data, never the corpus; untouched partitions'
    sketch binaries are carried through byte-identically (pytest-pinned
    in tests/test_bucketing_partitioning.py, with maintained estimates
    proven equal to a from-scratch rebuild of the kept stream).

    ``index``: per-(part, key...) sketch frame from
    ``hll_sketch_index(df, [part_col, *keys], col)``.
    ``kept_affected``: ALL surviving raw rows of every affected
    partition (the partition's kept remainder, not a diff).
    ``affected_parts``: one-column frame of ``part_col`` values that
    lost rows — explicit, because a fully-deleted partition has no
    kept rows to infer it from (its stale sketch must still drop).
    Estimates over the result come from ``merge_hll_indexes`` /
    ``hll_estimate`` as usual (register max-merge of per-partition
    sketches == sketch of the union, so the splice is lossless)."""
    untouched = index.join(affected_parts, part_col, "left_anti")
    rebuilt = hll_sketch_index(kept_affected, [part_col, *keys], col)
    return untouched.unionByName(rebuilt)
