"""Streaming incremental cluster maintenance — the live-ingest twin of
the batch ``dedup_clusters_new_batch`` query: every arriving
micro-batch of documents probes the persisted MinHash signature index
for duplicate edges, merges them into the persisted cluster LABEL
table via ``operators/clusters.py::incremental_dedup_clusters``, and
appends its own signatures so the next batch sees it. Neither the
corpus text nor the untouched labels are ever re-processed.

The reference has no streaming surface (batch pandas job,
/root/reference/src/etl_pipeline.py:692-712); this module is EXT,
required by the training-data-pipeline brief.

Storage layout (same per-batch-subdirectory discipline as
``incremental_dedup.signature_index_sink``):

- ``index_dir/{bands,shingles}/batch-<id>`` — the signature index.
- ``labels_dir/batch-<id>`` — LABEL DELTAS: (node, component,
  batch_id) rows for only the re-labelled (affected ∪ batch) nodes.
  Labels are updates, not appends, so the current table is the
  LATEST-WINS resolution over the deltas (``read_cluster_labels``) —
  per-batch write cost scales with the affected subgraph, never the
  corpus; compact offline with the upsert-snapshot pattern
  (streaming/sinks.py) when the delta chain grows long.

Edges use the UNCAPPED probe: byte-identical duplicates collide in
every band with jaccard 1.0, so exact-duplicate connectivity rides the
same probe and the accumulated clustering equals the full-corpus
recompute after any prefix of batches (the pytest pins two ordered
micro-batches against ``dedup_clusters``-style truth).

Replay idempotence: all three writes overwrite their own
``batch-<id>`` subdirectory. A replayed batch re-probes an index that
already holds its postings (self-pairs excluded, duplicates collapse)
and re-merges edges its labels already reflect — the merge is a
fixpoint, so the rewritten delta changes nothing downstream.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .incremental_dedup import _read_index

_LABELS_SCHEMA = "node bigint, component bigint, batch_id bigint"


def read_cluster_labels(spark: SparkSession, labels_dir: str) -> DataFrame:
    """Current (node, component) table: latest-wins over the per-batch
    deltas (max batch_id per node)."""
    deltas = _read_index(spark, labels_dir, _LABELS_SCHEMA)
    return (
        deltas.groupBy("node")
        .agg(F.max_by("component", "batch_id").alias("component"))
    )


def cluster_index_sink(
    index_dir: str,
    labels_dir: str,
    jaccard_threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_cap: int | None = None,
    observation=None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable maintaining signature index + cluster
    labels together:

        stream.writeStream.foreachBatch(
            cluster_index_sink(index, labels, 0.3)).start()

    Per micro-batch: (1) probe the batch against the signature index
    and keep pairs ≥ the jaccard threshold as duplicate edges; (2)
    merge those edges into the current labels, writing only the
    re-labelled delta under ``labels_dir/batch-<id>``; (3) append the
    batch's signatures under ``index_dir/{bands,shingles}/batch-<id>``.

    ``bucket_cap`` (default None = uncapped) bounds per-band-bucket
    work: a bucket whose union (index + batch) membership exceeds the
    cap contributes NO candidate pairs that micro-batch. The default
    keeps the exact incremental==full-recompute equivalence the pytest
    pins; SET the cap in a live feed where one hot template could make
    a single band bucket emit O(m²) pairs on one reducer every batch —
    the trade is bounded work for (observably) reduced recall. Pass a
    ``pyspark.sql.Observation`` as ``observation`` to read
    ``capped_buckets`` / ``dropped_ids`` per batch, same contract as
    ``incremental_minhash_candidates`` — never drop silently."""
    from ..operators.clusters import _incremental_labels
    from ..operators.dedup import (
        incremental_minhash_candidates,
        minhash_signature_index,
    )
    from .incremental_dedup import _BANDS_SCHEMA, _SHINGLES_SCHEMA

    bands_dir = os.path.join(index_dir, "bands")
    shingles_dir = os.path.join(index_dir, "shingles")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        idx_bands = _read_index(spark, bands_dir, _BANDS_SCHEMA)
        idx_shingles = _read_index(spark, shingles_dir, _SHINGLES_SCHEMA)
        docs = batch.select(id_col, text_col)
        new_bands, new_shingles = minhash_signature_index(docs, id_col, text_col)
        new_bands.persist()
        new_shingles.persist()
        try:
            edges = incremental_minhash_candidates(
                docs,
                idx_bands,
                idx_shingles,
                id_col,
                text_col,
                bucket_cap=bucket_cap,
                observation=observation,
                new_index=(new_bands, new_shingles),
            ).filter(F.col("jaccard") >= jaccard_threshold)
            labels = read_cluster_labels(spark, labels_dir)
            _, delta = _incremental_labels(
                labels,
                edges.select("doc_a", "doc_b"),
                batch.select(F.col(id_col).alias("node")),
                "doc_a",
                "doc_b",
            )
            delta.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
                "overwrite"
            ).parquet(os.path.join(labels_dir, f"batch-{batch_id}"))
            new_bands.write.mode("overwrite").parquet(
                os.path.join(bands_dir, f"batch-{batch_id}")
            )
            new_shingles.write.mode("overwrite").parquet(
                os.path.join(shingles_dir, f"batch-{batch_id}")
            )
        finally:
            new_bands.unpersist()
            new_shingles.unpersist()

    return _apply
