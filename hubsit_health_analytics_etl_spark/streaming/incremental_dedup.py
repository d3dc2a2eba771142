"""Streaming incremental dedup — the live-ingest twin of the batch
``dedup_new_batch`` query (operators/dedup.py): every arriving
micro-batch of documents is deduped against a PERSISTED MinHash
signature index, then its own signatures are appended to the index, so
the next batch sees it. The corpus is never re-shingled; per-batch cost
scales with the batch.

The reference has no streaming surface (it is a batch pandas job,
/root/reference/src/etl_pipeline.py:692-712); this module is EXT,
required by the training-data-pipeline brief.

Scale design: the index is (doc, band) postings + 60-bit shingle-hash
arrays on parquet — the same layout ``minhash_signature_index``
persists, written one subdirectory per micro-batch. Probing is an
equi-join on the band key; appending is a map-only write of the
batch's postings. State lives in files, not executor memory, so the
dedup horizon is unbounded (unlike ``dropDuplicatesWithinWatermark``,
which bounds state by TIME — the two are complementary: watermark
dedup kills short-horizon redelivery storms cheaply; the signature
index catches near-duplicates across the whole corpus history).

Semantics (monotone arrival): batch N's emitted pairs are the
candidate pairs between batch N and everything that arrived before it
(plus within-batch pairs). With no bucket cap, the union of all
emitted pairs after any prefix of batches equals the full-corpus
recompute restricted to pairs touching those batches — exactly
``dedup_new_batch``'s equivalence, applied per batch (the pytest
pins it across two ordered micro-batches). A bucket cap is evaluated
against the index-so-far, so its drops depend on arrival order —
pass ``bucket_cap=None`` when replaying history for a bit-exact
backfill.

Replay idempotence: every output is keyed by ``batch_id``
(subdirectory per batch, overwritten on re-run), so a micro-batch
re-delivered after a crash rewrites its own outputs instead of
appending duplicates. One nuance: a REPLAYED batch probes an index
that already contains its own postings — pair results are unchanged
(self-pairs are excluded, duplicates collapse in the distinct), but a
``bucket_cap`` would see those buckets inflated by the batch's own
postings once more; with a cap, treat replayed batches as best-effort
(the pairs written are still a subset of the uncapped truth).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_BANDS_SCHEMA = "doc_id bigint, band_idx int, band_key bigint"
_SHINGLES_SCHEMA = "doc_id bigint, hs array<bigint>"


def _index_has_batches(spark: SparkSession, path: str) -> bool:
    """Storage-agnostic existence probe via the Hadoop FileSystem API:
    the index may live on any Hadoop-supported store (local, HDFS,
    s3a, ...), so driver-local os.path checks would silently report
    'empty index' for every remote URI."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    return any(
        not st.getPath().getName().startswith(("_", "."))
        for st in fs.listStatus(hpath)
    )


def _read_index(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read all per-batch subdirectories of an index relation; an
    index that does not exist yet is an empty relation."""
    if _index_has_batches(spark, path):
        return (
            spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )
    return spark.createDataFrame([], schema)


def signature_index_sink(
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_cap: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable maintaining the signature index:

        stream.writeStream.foreachBatch(
            signature_index_sink(index, pairs)).start()

    Per micro-batch: (1) probe the batch against the index read from
    ``index_dir`` (new-vs-indexed ∪ new-vs-new candidates with exact
    Jaccard), writing pairs under ``pairs_dir/batch-<id>``; (2) append
    the batch's own postings + shingle hashes under
    ``index_dir/{bands,shingles}/batch-<id>``. Both writes overwrite
    their batch subdirectory, so replays are idempotent."""
    from ..operators.dedup import (
        incremental_minhash_candidates,
        minhash_signature_index,
    )

    bands_dir = os.path.join(index_dir, "bands")
    shingles_dir = os.path.join(index_dir, "shingles")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        idx_bands = _read_index(spark, bands_dir, _BANDS_SCHEMA)
        idx_shingles = _read_index(spark, shingles_dir, _SHINGLES_SCHEMA)
        docs = batch.select(id_col, text_col)
        # sign the batch ONCE, persisted: the signatures feed three
        # actions (pairs write, bands append, shingles append) — left
        # un-persisted, each action would replay the lineage and
        # re-shingle the micro-batch from the source
        new_bands, new_shingles = minhash_signature_index(docs, id_col, text_col)
        new_bands.persist()
        new_shingles.persist()
        try:
            pairs = incremental_minhash_candidates(
                docs,
                idx_bands,
                idx_shingles,
                id_col,
                text_col,
                bucket_cap=bucket_cap,
                new_index=(new_bands, new_shingles),
            )
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, f"batch-{batch_id}")
            )
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


def read_emitted_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All candidate pairs emitted so far, across every micro-batch."""
    return _read_index(spark, pairs_dir, "doc_a bigint, doc_b bigint, jaccard double")
