"""Output sinks — SURVEY.md §2.1 S5–S7.

Engine decision (SURVEY.md §7.3): Parquet is the native sink (columnar,
splittable, stats + partition pruning for downstream readers); the
Power-BI CSV dialect (';'-separated, decimal-comma —
/root/reference/src/etl_pipeline.py:470 ×10 outputs) exists only at the
export edge, applied to already-aggregated small tables.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Native sink. ``partition_by`` (e.g. a date column) gives
    downstream partition pruning — the 100 TB layout lever."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def _decimal_comma(df: DataFrame, scale: int = 2) -> DataFrame:
    """Render float columns as decimal-comma strings (Spark's CSV
    writer has no ``decimal`` option — the reference relies on pandas
    ``to_csv(decimal=',')``)."""
    for c, t in df.dtypes:
        if t in ("double", "float"):
            df = df.withColumn(
                c,
                F.regexp_replace(
                    F.regexp_replace(F.format_number(F.col(c), scale), ",", ""),
                    r"\.",
                    ",",
                ),
            )
    return df


def write_csv_pbi(
    df: DataFrame,
    path: str,
    single_file: bool = True,
    encoding: str = "UTF-8",
    scale: int = 2,
) -> None:
    """S5/S6: Power-BI dialect CSV export: ';' separator, header,
    decimal comma, optionally coalesced to one part file (fine for the
    small aggregate outputs this is meant for; never use on a fact
    table — coalesce(1) serializes the job)."""
    out = _decimal_comma(df, scale)
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("sep", ";")
        .option("header", True)
        .option("encoding", encoding)
        .csv(path)
    )


def export_single_csv_file(df: DataFrame, file_path: str, **kwargs) -> None:
    """Write a true single *file* (not a directory) for hand-off —
    the reference's toPandas().to_csv workaround (Criptografia.py:175-183)
    replaced by a native write + driver-side rename (local FS only)."""
    tmp_dir = file_path + "._tmp"
    write_csv_pbi(df, tmp_dir, single_file=True, **kwargs)
    part = sorted(glob.glob(os.path.join(tmp_dir, "part-*.csv")))[0]
    shutil.move(part, file_path)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def collect_pandas(df: DataFrame):
    """S8: the collect-to-driver edge, Arrow-accelerated (the reference
    collects WITHOUT Arrow — Criptografia.py:175 — paying row-at-a-time
    serialization). Only for small aggregate outputs; never a fact
    table."""
    sess = df.sparkSession
    assert sess.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true", (
        "Arrow must be enabled for the collect edge (session.py sets it)"
    )
    return df.toPandas()


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed table: two tables bucketed identically on the
    join key join WITHOUT a shuffle exchange (co-located join) — the
    pre-partitioning lever for repeated big-big joins at 100 TB.
    ``path`` makes it an EXTERNAL bucketed table at an explicit
    location (callers that must not write into the session's
    warehouse directory — e.g. run-scoped fixture tables)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
