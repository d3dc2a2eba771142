"""Snapshot diff — change-data-capture between two versions of a
table without a log: (key, change_type ∈ insert/update/delete) from a
full-outer key join of row FINGERPRINTS.

A 100 TB ingest pipeline re-receives full dumps (crawl refreshes,
vendor drops) far more often than it receives clean change logs;
diffing snapshot N against N-1 turns the dump into an incremental
feed the downstream incremental operators (exact/MinHash/cluster
index maintenance in this package) can consume.

Scale shape — the whole point of the fingerprint: each side is
reduced MAP-SIDE to (key, md5-of-compared-columns) before the join,
so the shuffle moves keys + 32 hex chars instead of full rows (for a
wide documents table that is a ~100× shuffle-payload cut), and the
join itself is a plain equi full-outer — AQE-sized, skew-splittable,
and ZERO-shuffle when both snapshots are written bucketed by the key
(sources/sinks.py::write_bucketed_table). Values never cross the
join; a consumer that needs the changed rows semi-joins the emitted
keys back against the new snapshot (partition-pruned at scale).

No reference counterpart (the pandas reference re-reads full CSVs,
/root/reference/src/etl_pipeline.py:63-88); this is the beyond-
reference ingest surface the brief's training-data pipeline needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Unit separator / NUL — cannot appear in the fixture columns, so the
# concat is collision-free across column boundaries and null vs ''.
_SEP = "\u001f"
_NULL = "\u0000"


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over the compared columns, null-safe and boundary-safe:
    every column is cast to string (Spark's double→string is shortest
    round-trip, hence injective on distinct values), nulls become a
    sentinel that concat_ws would otherwise silently skip (which
    would collide ('a', null) with (null, 'a'))."""
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changed keys between two snapshots: one row per key that was
    inserted (in ``new`` only), deleted (in ``old`` only), or updated
    (in both, any compared column differs). Unchanged keys are
    filtered before the result materializes. ``compare_cols`` defaults
    to every non-key column of ``old``."""
    cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(*keys, row_fingerprint(cols).alias("_fp_old"))
    n = new.select(*keys, row_fingerprint(cols).alias("_fp_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("insert"))
        .when(F.col("_fp_new").isNull(), F.lit("delete"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("update"))
    )
    return (
        j.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE INTO semantics as a batch operator: WHEN MATCHED take the
    SOURCE row (the whole row — a legitimately-NULL source value
    overwrites, which a naive COALESCE(source, target) would silently
    lose), WHEN NOT MATCHED BY TARGET insert, WHEN NOT MATCHED BY
    SOURCE keep the target row. Emits the merged table plus a
    ``merge_action`` column (insert / update / unchanged / kept) so a
    downstream CDC consumer sees what happened without re-diffing.
    Every non-key target column is carried through the merge;
    ``compare_cols`` narrows ONLY the update-vs-unchanged typing (a
    matched row whose differences are all outside ``compare_cols``
    reports 'unchanged' — but still takes the source values).

    Scale shape: one equi full-outer join on the keys — AQE-sized,
    skew-splittable, zero-shuffle when both sides are bucketed by the
    key; a small delta against a bucketed target is the classic
    nightly-upsert plan. update-vs-unchanged typing reuses
    row_fingerprint, so wide rows compare as 32 hex chars."""
    cols = [c for c in target.columns if c not in keys]
    fp_cols = compare_cols or cols
    t = target.select(
        *keys, *cols, row_fingerprint(fp_cols).alias("_fp_t"), F.lit(1).alias("_t")
    )
    s = source.select(
        *keys,
        *[F.col(c).alias(f"_s_{c}") for c in cols],
        row_fingerprint(fp_cols).alias("_fp_s"),
        F.lit(1).alias("_s"),
    )
    j = t.join(s, keys, "full_outer")
    matched = F.col("_s").isNotNull()
    merged = [
        F.when(matched, F.col(f"_s_{c}")).otherwise(F.col(c)).alias(c) for c in cols
    ]
    action = (
        F.when(F.col("_t").isNull(), F.lit("insert"))
        .when(F.col("_s").isNull(), F.lit("kept"))
        .when(F.col("_fp_t") != F.col("_fp_s"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, *merged, action.alias("merge_action"))


def maintain_additive_rollup(
    base_rollup: DataFrame,
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    group_col: str,
    value_col: str,
    n_col: str = "n",
    sum_col: str = "s",
) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance for an additive
    (COUNT, SUM) rollup — the IVM shape real warehouses name as a
    feature: instead of recomputing ``new``'s rollup from scratch,
    apply only the CHANGED rows' group deltas to the persisted
    ``base_rollup`` (columns ``group_col, n_col, sum_col``, the rollup
    of ``old``):

        insert  →  (+1, +value) under its new group
        delete  →  (−1, −old value) under its old group
        update  →  both contributions — so a row that MOVES groups
                   decrements the old group and increments the new
                   one, and an in-place value change nets the
                   difference; a group whose count reaches 0 drops
                   from the view entirely (exactly what a recompute
                   yields).

    ``value_col`` must be an integer (fixed-point) column: additive
    maintenance is only EXACT when the sums are exact — float sums
    would drift from a recompute by reassociation. Correctness is the
    additive-law argument of the *_new_batch family run over a
    general changelog, proved per-query by the full-recompute oracle.

    Scale shape: snapshot_diff reduces both snapshots map-side to
    (key, fingerprint) so the change detection shuffles keys + 32 hex
    chars; only CHANGED keys join back for values (semi-join pattern,
    partition-pruned at scale); the delta aggregate is
    |changed-groups|-sized; the final merge is a full-outer join
    against a view whose cardinality is the group count. Per-refresh
    cost ∝ churn, never table size."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    bad = [
        f"{name}.{value_col}: {df.schema[value_col].dataType.simpleString()}"
        for name, df in (("old", old), ("new", new))
        if not isinstance(df.schema[value_col].dataType, integral)
    ]
    if bad:
        # fail loudly instead of silently truncating a float/decimal
        # through the bigint cast below (ADVICE r12): delta maintenance
        # is only exact — equal to a recompute — over integer sums
        raise ValueError(
            "maintain_additive_rollup: value_col must be an integral "
            f"column (additive maintenance is only exact over integer "
            f"sums); got [{'; '.join(bad)}]. Fixed-point-scale the "
            "value (e.g. cents as bigint) before maintaining."
        )
    diff = snapshot_diff(old, new, keys, [group_col, value_col])
    old_side = (
        diff.filter(F.col("change_type").isin("delete", "update"))
        .select(*keys)
        .join(old, keys)
        .select(
            F.col(group_col),
            F.lit(-1).cast("bigint").alias("_dn"),
            (-F.col(value_col)).cast("bigint").alias("_ds"),
        )
    )
    new_side = (
        diff.filter(F.col("change_type").isin("insert", "update"))
        .select(*keys)
        .join(new, keys)
        .select(
            F.col(group_col),
            F.lit(1).cast("bigint").alias("_dn"),
            F.col(value_col).cast("bigint").alias("_ds"),
        )
    )
    deltas = (
        old_side.unionByName(new_side)
        .groupBy(group_col)
        .agg(
            F.sum("_dn").cast("bigint").alias("_dn"),
            F.sum("_ds").cast("bigint").alias("_ds"),
        )
    )
    merged = base_rollup.join(deltas, group_col, "full_outer").select(
        F.col(group_col),
        (F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0)))
        .cast("bigint")
        .alias(n_col),
        (
            F.coalesce(F.col(sum_col), F.lit(0))
            + F.coalesce(F.col("_ds"), F.lit(0))
        )
        .cast("bigint")
        .alias(sum_col),
    )
    return merged.filter(F.col(n_col) > 0)
