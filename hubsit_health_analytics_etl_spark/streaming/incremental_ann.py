"""Streaming incremental ANN — the vector twin of
``streaming/incremental_dedup.py``: every arriving micro-batch of
embeddings is searched against a PERSISTED IVF index (centroids + cell
assignments on parquet), then its own cell assignments are appended,
so the next batch sees it. Corpus vectors are never re-scored;
per-batch cost scales with the batch.

The reference has no streaming or vector surface (batch pandas,
/root/reference/src/etl_pipeline.py:692-712); this module is EXT,
required by the training-data-pipeline brief.

Design decisions that make this the 100 TB shape:

- The coarse quantizer is TRAINED ONCE (the ``centroids`` DataFrame
  passed to the sink factory, e.g. ``kmeans_centroids`` over an
  initial corpus sample) and frozen into ``index_dir/centroids`` on
  the first micro-batch: re-training per batch would re-assign every
  historical vector's cell — a full-index rewrite per trigger.
- Assignments carry an explicit ``batch_id`` column and the search
  filters the index to ``batch_id < current``: batch N's results are
  EXACTLY its top-k among batches 0..N-1 (monotone arrival), and a
  REPLAYED batch — whose own postings are already in the index —
  reproduces its original results bit-for-bit instead of matching
  itself. The predicate reaches the parquet scan (row-group pruning).
- Every per-batch output overwrites its own ``batch-<id>``
  subdirectory, so crash-replays rewrite rather than append.
- State lives in files via the Hadoop FileSystem API (any supported
  store — local, HDFS, s3a), not executor memory: the search horizon
  is unbounded.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .incremental_dedup import _index_has_batches


def ivf_index_sink(
    index_dir: str,
    results_dir: str,
    centroids: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable maintaining a persisted IVF index:

        stream.writeStream.foreachBatch(
            ivf_index_sink(index, results, centroids, k=5)).start()

    Per micro-batch: (1) search the batch against all EARLIER batches'
    assignments (equi-join on the cell id, queries broadcast-guarded),
    writing (query_id, cell, neighbor_id, cosine, rank) under
    ``results_dir/batch-<id>``; (2) append the batch's own home-cell
    assignments + precomputed norms under
    ``index_dir/assignments/batch-<id>``."""
    from ..operators.similarity import _ranked_cells, ivf_search_index

    cent_dir = os.path.join(index_dir, "centroids")
    assign_dir = os.path.join(index_dir, "assignments")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if not _index_has_batches(spark, cent_dir):
            centroids.write.mode("overwrite").parquet(cent_dir)
        cents = spark.read.parquet(cent_dir)
        vecs = batch.select(id_col, vec_col)
        # home-cell assignment of the arriving batch, computed once and
        # persisted: it feeds the index append and (indirectly) defines
        # what later batches search
        assigned = (
            _ranked_cells(vecs, cents, id_col, vec_col)
            .filter(F.col("rn") == 1)
            .select(id_col, vec_col, "nrm", "cell")
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        assigned.persist()
        try:
            if _index_has_batches(spark, assign_dir):
                idx = (
                    spark.read.option("recursiveFileLookup", "true")
                    .parquet(assign_dir)
                    .filter(F.col("batch_id") < batch_id)
                    .drop("batch_id")
                )
            else:
                idx = spark.createDataFrame([], assigned.schema).drop("batch_id")
            results = ivf_search_index(
                idx, cents, vecs, k, id_col, vec_col, nprobe=nprobe
            )
            results.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"batch-{batch_id}")
            )
            assigned.write.mode("overwrite").parquet(
                os.path.join(assign_dir, f"batch-{batch_id}")
            )
        finally:
            assigned.unpersist()

    return _apply


def read_search_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """All per-batch search results emitted so far."""
    if _index_has_batches(spark, results_dir):
        return spark.read.option("recursiveFileLookup", "true").parquet(results_dir)
    return spark.createDataFrame(
        [], "query_id bigint, cell int, neighbor_id bigint, cosine double, rank int"
    )
