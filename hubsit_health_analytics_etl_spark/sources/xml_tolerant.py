"""Tolerant XML source/sink (Spark 4's built-in XML data source) —
EXT: the reference ingests only CSV
(/root/reference/src/etl_pipeline.py:97-148), but the health-data
domain it lives in (and most B2B/vendor interchange) ships XML
(HL7/CDA-style exports, appointment feeds). Same audit contract as
``csv_tolerant.read_csv_tolerant`` / ``jsonl.read_jsonl``: PERMISSIVE
parsing keeps malformed records as ``_corrupt_record`` audit rows
instead of failing the job or silently dropping them.

Scale note: unlike CSV/JSONL, an XML file is NOT line-splittable —
Spark parallelizes across FILES (rowTag scanning within a file is one
task), so at 100 TB the ingest layout must be many medium files, not
one giant document; re-land to parquet immediately (``write_parquet``)
and keep XML at the ingest edge only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .jsonl import split_audit  # same audit contract, reused verbatim


def read_xml_tolerant(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read XML (one row per ``row_tag`` element) with a
    corrupt-record audit column.

    With an explicit ``schema`` (DDL string — pass one in production:
    inference is an extra full scan), malformed elements land in
    ``corrupt_col`` with every schema column null; with ``schema=None``
    the reader infers — and because Spark's XML inference only emits
    the corrupt column when the sampled file actually CONTAINS
    malformed elements, a clean feed would come back without it, so
    the audit column is added (all-null) when absent to keep the
    contract unconditional. Split the result with
    :func:`~.jsonl.split_audit` — the audit contract is shared with
    the CSV/JSONL readers, so quarantine plumbing is format-agnostic."""
    reader = (
        spark.read.option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        reader = reader.schema(f"{schema}, {corrupt_col} string")
    df = reader.xml(path)
    if corrupt_col not in df.columns:
        df = df.withColumn(corrupt_col, F.lit(None).cast("string"))
    return df


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Write XML (one ``row_tag`` element per row, one document per
    partition file). Interchange-edge only — parquet is the engine's
    storage format."""
    (
        df.write.mode(mode)
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .xml(path)
    )


def xml_ingest_report(df: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    """One-row ingest audit: (n_rows, n_clean, n_corrupt) — the
    accept/quarantine split a vendor-feed gate reads before landing
    the batch. Cache the parsed frame first when the source is a raw
    XML scan (the corrupt-only-projection restriction shared with
    JSONL — see split_audit's docstring)."""
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col(corrupt_col).isNull().cast("int"))
        .cast("bigint")
        .alias("n_clean"),
        F.sum(F.col(corrupt_col).isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_corrupt"),
    )
