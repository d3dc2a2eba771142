"""Tolerant JSONL (newline-delimited JSON) source/sink — the lingua
franca of LLM training-data interchange (one document object per
line). EXT: the reference ingests only CSV
(/root/reference/src/etl_pipeline.py:97-148); a training-data engine
needs the same tolerant-ingest posture for JSONL.

Same audit contract as ``csv_tolerant.read_csv_tolerant``: PERMISSIVE
parsing keeps malformed lines as ``_corrupt_record`` audit rows
instead of failing the job or silently dropping them. The scan is
splittable (plain-text JSONL splits on line boundaries; at 100 TB
prefer zstd-in-parquet for curated outputs and keep JSONL at the
ingest edge only — see ``write_parquet``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read JSONL with a corrupt-record audit column.

    With an explicit ``schema`` (DDL string — pass one in production:
    schema inference is an extra full scan of the data), malformed
    lines land in ``corrupt_col`` with every schema column null; with
    ``schema=None`` the reader infers from the data and the corrupt
    column is added to the inferred schema. Rows where both the data
    columns and ``corrupt_col`` are null do not exist — every input
    line is either parsed or audited, never dropped."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        full = f"{schema}, {corrupt_col} string"
        reader = reader.schema(full)
    return reader.json(path)


def split_audit(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, audit): clean rows without the audit column, and the
    malformed rows (schema columns null + the raw line) for
    quarantine/repair. Both are lazy filters of the same scan — no
    extra read. The audit frame keeps ALL columns (the schema columns
    are null on audit rows), which is what a quarantine write wants.

    Spark restriction to know: an AGGREGATE-ONLY consumption of the
    audit side (e.g. ``audit.count()``) prunes the projection down to
    just the corrupt column, which Spark disallows on a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Writes and collects reference
    the data columns and are fine; for a bare count, ``df.cache()``
    the parsed frame first — Spark's own documented pattern."""
    if corrupt_col not in df.columns:
        return df, df.limit(0).withColumn(corrupt_col, F.lit(None).cast("string"))
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    audit = df.filter(F.col(corrupt_col).isNotNull())
    return clean, audit


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write JSONL (one object per line, one file per partition).
    ``compression='gzip'/'zstd'`` for interchange; leave None for
    splittable plain text."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
