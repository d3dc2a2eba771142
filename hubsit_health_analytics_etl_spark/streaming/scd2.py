"""Streaming SCD2 maintenance — a ``foreachBatch`` sink that applies
each micro-batch of keyed change events to a persisted type-2
dimension via the SAME seed-event replay core the registered batch
query runs (`workloads/w19_incremental_dims.py::apply_scd2_changes`),
completing the SCD2 lifecycle: from-scratch build
(``scd2_priority_history``) → batch apply (``scd2_apply_changes``) →
point-in-time probe (``scd2_point_in_time_shipments``) → STREAMING
apply (this module).

Contract (the markov/CUSUM append-only law): per-key events must
arrive time-ordered across micro-batches — each batch is strictly
later than the dimension's open intervals, which is exactly what
makes closed versions immutable (segmentation is prefix-stable). The
equality test replays a chronological feed in slices and pins the
final dimension against the from-scratch gaps-and-islands build,
row-for-row.

Scale notes: per batch, only affected keys' OPEN rows re-derive (one
keyed window over seed ∪ batch rows); the snapshot rewrite inside
``foreachBatch`` is the documented dimension-sized edge — swap it for
a transactional MERGE (sinks.py discussion) at fact scale, keeping
the apply core unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

DIM_COLS = (
    "o_custkey",
    "priority",
    "valid_from_d",
    "valid_to_d",
    "n_orders",
    "is_current",
)


def scd2_build(events: DataFrame) -> DataFrame:
    """From-scratch dimension over a bounded (o_custkey, o_orderkey,
    priority, d) log — the gaps-and-islands build in its typed
    (date-columned) form; what the streaming sink's state converges
    to on a chronological replay."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    s = events.withColumn(
        "chg",
        F.when(
            F.lag("priority").over(w).eqNullSafe(F.col("priority")), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    g = s.withColumn(
        "seg", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    segs = g.groupBy("o_custkey", "seg", "priority").agg(
        F.min("d").alias("vf"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("seg")
    nxt = F.lead("vf").over(w2)
    return segs.select(
        "o_custkey",
        "priority",
        F.col("vf").alias("valid_from_d"),
        nxt.alias("valid_to_d"),
        "n_orders",
        F.when(nxt.isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
    )


def scd2_apply_sink(dim_path: str):
    """``foreachBatch`` callable maintaining an SCD2 dimension at
    ``dim_path``::

        stream.writeStream.foreachBatch(scd2_apply_sink(path)).start()

    First batch bootstraps the dimension from itself (the from-scratch
    build); later batches run the shared apply core. Snapshot rewrite
    follows sinks.py::upsert_batch's crash-safe ordering: the tmp
    write EXECUTES the read of the old snapshot before any rename, the
    old directory is renamed aside only after the new one is complete,
    and a dangling ``._old`` recovers on the next call."""
    from ..workloads.w19_incremental_dims import apply_scd2_changes

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        old = dim_path + "._old"
        if os.path.exists(old):
            if os.path.exists(dim_path):
                shutil.rmtree(old)  # crash after swap completed — stale
            else:
                os.rename(old, dim_path)  # crash between renames — recover
        if os.path.exists(dim_path):
            dim = spark.read.parquet(dim_path)
            new_dim = apply_scd2_changes(dim, batch).select(*DIM_COLS)
        else:
            new_dim = scd2_build(batch).select(*DIM_COLS)
        tmp = dim_path + "._tmp"
        new_dim.write.mode("overwrite").parquet(tmp)  # executes the read
        if os.path.exists(dim_path):
            os.rename(dim_path, old)
        os.rename(tmp, dim_path)
        shutil.rmtree(old, ignore_errors=True)

    return _apply
