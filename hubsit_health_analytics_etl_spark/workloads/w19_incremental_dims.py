"""SCD2 dimension MAINTENANCE — apply a late-arriving change batch to
a persisted type-2 dimension (VERDICT r13 #5): close open intervals,
extend same-value runs, insert new versions — the write side of the
star-schema lifecycle whose read side ``scd2_point_in_time_shipments``
probes and whose from-scratch build ``scd2_priority_history`` proves.

Registration order note: imports after w01–w18 (registry tail — the
driver-gate rotation spends its window on the verification backlog).
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

from .w02_dedup import _run_scoped_index_dir  # noqa: E402
from .w09_curation_lifecycle import _SCD2_HISTORY_SQL  # noqa: E402

# Orders on/after this date form the "late-arriving" change feed; the
# standing dimension is built from the strictly-earlier log. TPC-H
# order dates span 1992-01-01..1998-08-02, so the batch is ~20% of
# events at every fixture SF.
SCD2_BATCH_CUTOFF = "1997-01-01"


@query("scd2_apply_changes", _SCD2_HISTORY_SQL)
def q_scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change batch to a PERSISTED SCD2 dimension and return
    the maintained history; the oracle is the from-scratch
    ``scd2_priority_history`` rebuild over the FULL log, so the hash
    match proves apply ≡ rebuild (the dedup_clusters_new_batch
    write+probe contract, dimension-shaped).

    The append law this pins: a strictly-later event batch can never
    edit CLOSED versions — segmentation is prefix-stable, so only each
    affected key's OPEN row is at stake (extended in place when the
    first new value continues its run, else closed at the first new
    ``valid_from``) plus appended new versions. Implementation: the
    open row collapses to a SEED pseudo-event carrying its
    (value, valid_from, n_orders weight); seed + batch events replay
    the standard gaps-and-islands build per affected key, so extend /
    close / insert all fall out of ONE windowed pass — no per-case
    branching. Closed rows and unaffected keys pass through from the
    persisted dimension with no window touching them.

    Scale shape: the change feed is filtered BEFORE any window
    (predicate pushdown on o_orderdate); every window/groupBy keys on
    o_custkey so the batch replay is one shuffle over (seed ∪ batch)
    rows only — cost ∝ affected keys' open rows + batch, never the
    dimension. At 100 TB keep the dimension partitioned by
    is_current so the open-row probe prunes files (the SCD2 variant
    of the versioned-table point-lookup posture)."""
    import os

    from pyspark.sql import Window

    from ..sources.sinks import write_parquet

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("d"),
    )
    standing_log = o.filter(F.col("d") < F.lit(SCD2_BATCH_CUTOFF))
    batch = o.filter(F.col("d") >= F.lit(SCD2_BATCH_CUTOFF))

    # persisted standing dimension (write+probe: built from the early
    # log inside the timed body, read back from parquet)
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    s = standing_log.withColumn(
        "chg",
        F.when(
            F.lag("priority").over(w).eqNullSafe(F.col("priority")), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    g = s.withColumn(
        "seg", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    segs = g.groupBy("o_custkey", "seg", "priority").agg(
        F.min("d").alias("vf"), F.count(F.lit(1)).alias("n_orders")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("seg")
    nxt = F.lead("vf").over(w2)
    dim = segs.select(
        "o_custkey",
        "priority",
        F.col("vf").alias("valid_from_d"),
        nxt.alias("valid_to_d"),
        "n_orders",
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )
    path = os.path.join(_run_scoped_index_dir("scd2_dim"), "dim")
    write_parquet(dim, path)
    dim = spark.read.parquet(path)

    out = apply_scd2_changes(dim, batch)
    return out.select(
        "o_custkey",
        "priority",
        F.date_format("valid_from_d", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to_d", "yyyy-MM-dd"), F.lit("9999-12-31")
        ).alias("valid_to"),
        "n_orders",
        F.col("is_current").cast("bigint").alias("is_current"),
    )


def apply_scd2_changes(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """The SCD2 apply core — shared by the registered batch query and
    the streaming twin (streaming/scd2.py): merge a strictly-later
    event batch (o_custkey, o_orderkey, priority, d) into a
    (o_custkey, priority, valid_from_d, valid_to_d, n_orders,
    is_current) dimension via seed-event replay. Closed rows never
    change (segmentation is prefix-stable); each affected key's open
    row collapses to one weighted pseudo-event and replays with the
    batch through the standard gaps-and-islands build — extend /
    close / insert with no branching."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("seg")
    affected = batch.select("o_custkey").distinct()
    open_rows = dim.filter(F.col("is_current") == 1).join(
        affected, "o_custkey", "left_semi"
    )
    # the open version as a seed pseudo-event: its valid_from and
    # n_orders weight replay the whole open run in one row (okey -1
    # only documents intent — seed dates strictly precede the batch)
    seed = open_rows.select(
        "o_custkey",
        F.lit(-1).cast("long").alias("o_orderkey"),
        "priority",
        F.col("valid_from_d").alias("d"),
        F.col("n_orders").alias("wt"),
    )
    ev = seed.unionByName(
        batch.select(
            "o_custkey",
            "o_orderkey",
            "priority",
            "d",
            F.lit(1).cast("bigint").alias("wt"),
        )
    )
    rs = ev.withColumn(
        "chg",
        F.when(
            F.lag("priority").over(w).eqNullSafe(F.col("priority")), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "seg", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    rsegs = rs.groupBy("o_custkey", "seg", "priority").agg(
        F.min("d").alias("vf"), F.sum("wt").cast("bigint").alias("n_orders")
    )
    rnxt = F.lead("vf").over(w2)
    replayed = rsegs.select(
        "o_custkey",
        "priority",
        F.col("vf").alias("valid_from_d"),
        rnxt.alias("valid_to_d"),
        "n_orders",
        F.when(rnxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )

    # closed rows never change; unaffected open rows pass through
    untouched = dim.filter(F.col("is_current") == 0).unionByName(
        dim.filter(F.col("is_current") == 1).join(
            affected, "o_custkey", "left_anti"
        )
    )
    return untouched.unionByName(replayed)
