"""Small-file compaction — the table-maintenance job every long-lived
100 TB dataset needs. Streaming sinks, incremental ingests and
over-parallel writers leave thousands of KB-size parquet files per
directory; every downstream scan then pays one task + one footer read
per file, and the NameNode/object-store pays the listing. Compaction
rewrites a directory to ~target-size files without changing its rows.

Scale posture: this module rewrites ONE directory (or one partition
directory) per call — the unit a real maintenance job parallelizes
over partitions, oldest-first, off-peak. The swap is
write-new-then-rename, the local twin of the snapshot-commit a table
format (Iceberg/Delta) does with a manifest pointer; readers never see
a half-written directory. No counterpart in the reference (pandas
rewrites whole CSVs each run — /root/reference/src/etl_pipeline.py:464
keeps no incremental state at all).
"""

from __future__ import annotations

import glob
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 << 20  # one HDFS-ish block per file


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the *.parquet data files under
    ``path`` (recursive — covers partition subdirectories)."""
    files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def plan_compaction(
    total_bytes: int, target_file_bytes: int = DEFAULT_TARGET_BYTES
) -> int:
    """Output file count for a directory of ``total_bytes``: ceil to
    the target size, never zero. Deliberately a pure function so the
    sizing rule is unit-testable next to operators/scaleparams.py."""
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``plan_compaction(...)`` files and atomically swap it in. Returns
    the new file count. Round-robin ``repartition(n)`` (not coalesce)
    so output files are even-sized regardless of input skew — coalesce
    glues whole input partitions and inherits their imbalance."""
    n_files, total = parquet_file_stats(path)
    n_out = plan_compaction(total, target_file_bytes)
    if n_files <= n_out:
        return n_files  # already compact — never rewrite for nothing
    df: DataFrame = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__pre_compact"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_stats(path)[0]
