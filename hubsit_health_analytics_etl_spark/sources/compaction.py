"""Small-file compaction — the table-maintenance job every long-lived
100 TB dataset needs. Streaming sinks, incremental ingests and
over-parallel writers leave thousands of KB-size parquet files per
directory; every downstream scan then pays one task + one footer read
per file, and the NameNode/object-store pays the listing. Compaction
rewrites a directory to ~target-size files without changing its rows.

Scale posture: this module rewrites ONE directory (one partition
directory of a partitioned table) per call — the unit a real
maintenance job parallelizes over partitions, oldest-first, off-peak.
The swap is write-new-verify-then-rename: readers never see a
half-written directory, the rewrite is row-count-verified before it
replaces anything, and every entry repairs a crashed prior run's
leftovers (see compact_parquet's contract — single-writer,
crash-recoverable; a table format's manifest-pointer commit is the
atomic upgrade). No counterpart in the reference (pandas
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


def _recover_interrupted(path: str, tmp: str, old: str) -> None:
    """Repair the directory state a crashed prior run left behind.
    A stale ``__compacting`` is an incomplete (unverified) rewrite —
    delete it. A stale ``__pre_compact`` backup with no live ``path``
    means the crash hit between the two swap renames — restore the
    backup; with a live ``path`` the swap completed and only the
    cleanup was lost — drop the backup."""
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``plan_compaction(...)`` files and swap it in. Returns the new
    file count. Round-robin ``repartition(n)`` (not coalesce) so
    output files are even-sized regardless of input skew — coalesce
    glues whole input partitions and inherits their imbalance.

    Contract: SINGLE WRITER per directory, crash-RECOVERABLE rather
    than atomic — POSIX offers no multi-directory atomic swap, so the
    swap is two renames. The rewrite is row-count-verified by
    re-reading it BEFORE the swap starts (a short write never
    replaces good data), every entry first repairs whatever a crashed
    prior run left behind (``_recover_interrupted``), and the only
    remaining crash window — between the two renames — leaves the
    intact backup that the next invocation restores. Readers racing a
    crashed swap can observe a missing directory until that repair
    runs; a table format's manifest pointer (Iceberg/Delta) is the
    upgrade when that window matters.

    Partitioned-table roots are REFUSED: compacting through the root
    would rewrite partition columns into data columns and break
    downstream partition pruning — compact per partition directory
    (the documented one-directory-per-call unit)."""
    p = path.rstrip("/")
    tmp, old = p + "__compacting", p + "__pre_compact"
    _recover_interrupted(p, tmp, old)
    part_dirs = [
        d
        for d in os.listdir(p)
        if os.path.isdir(os.path.join(p, d)) and "=" in d
    ]
    if part_dirs:
        raise ValueError(
            f"compact_parquet: {path} is a partitioned-table root "
            f"(subdirectories {sorted(part_dirs)[:3]}...); rewriting "
            "through the root would fold partition columns into data "
            "files and break partition pruning — compact each "
            "partition directory individually."
        )
    n_files, total = parquet_file_stats(p)
    n_out = plan_compaction(total, target_file_bytes)
    if n_files <= n_out:
        return n_files  # already compact — never rewrite for nothing
    df: DataFrame = spark.read.parquet(p)
    n_rows = df.count()
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    n_new = spark.read.parquet(tmp).count()
    if n_new != n_rows:
        shutil.rmtree(tmp)
        raise IOError(
            f"compact_parquet: rewrite of {path} read back {n_new} rows "
            f"!= source {n_rows}; keeping the original directory."
        )
    os.rename(p, old)
    os.rename(tmp, p)
    shutil.rmtree(old)
    return parquet_file_stats(p)[0]
