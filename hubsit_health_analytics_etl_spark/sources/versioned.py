"""Snapshot-versioned parquet table — a minimal manifest-pointer
table format (the Iceberg/Delta shape) giving the engine's
CDC/compaction/export family COHERENT MULTI-VERSION SEMANTICS:

- every commit writes ONLY NEW immutable data files plus one manifest
  (the list of files composing that version), then swaps one pointer
  file atomically (``os.replace``);
- readers resolve the pointer (or an explicit version) ONCE and then
  read only immutable files — a reader can never observe a
  half-committed table, and commits racing a long read cannot change
  the files under it (the snapshot-isolation property the plain
  full-snapshot rewrite in streaming/sinks.py:1-21 admits it lacks);
- ``read_version(spark, root, n)`` is time travel: audit yesterday's
  training dump, diff two ingests (orders_version_diff), reproduce a
  run. ``mode="append"`` commits reuse the parent's files untouched —
  an ingest's commit cost is its batch, never the corpus.

Scale/posture notes:
- The manifest lists FILES, not rows: commit metadata is O(files).
  At 100 TB keep per-commit file counts bounded (compact with
  sources/compaction.py against a fresh ``data/`` subdirectory, then
  commit the compacted files as a new overwrite version — old
  versions keep referencing the uncompacted files, still readable).
- SINGLE WRITER per table (the compact_parquet contract); readers are
  unlimited and lock-free. Writer crash recovery: anything newer than
  the pointer is uncommitted garbage — every commit entry deletes
  stale manifests/data dirs above the pointer before picking its
  version number, so a crashed commit is invisible and re-runnable.
- ``os.replace`` is atomic on POSIX filesystems; on an object store,
  swap the pointer via the store's conditional-put instead.
- ``expire_versions`` is the retention job: drops manifests older
  than the keep-window and deletes data files no kept version
  references. Readers of an expired version fail loudly (missing
  manifest), never silently read partial data.

No reference counterpart (the pandas reference overwrites its CSVs
in place each run — /root/reference/src/etl_pipeline.py:464-688 keeps
no history at all); beyond-reference engine surface.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_VERSION"


def _manifest_path(root: str, n: int) -> str:
    return os.path.join(root, "manifests", f"v{n:06d}.json")


def current_version(root: str) -> int | None:
    """The committed version the pointer names; None for an empty or
    never-committed table."""
    p = os.path.join(root, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def list_versions(root: str) -> list[int]:
    """Committed (pointer-reachable) versions, ascending."""
    cur = current_version(root)
    if cur is None:
        return []
    out = []
    for m in glob.glob(os.path.join(root, "manifests", "v*.json")):
        n = int(os.path.basename(m)[1:-5])
        if n <= cur:
            out.append(n)
    return sorted(out)


def read_manifest(root: str, n: int) -> dict:
    with open(_manifest_path(root, n)) as f:
        return json.load(f)


def _repair(root: str) -> None:
    """Delete anything a crashed commit left ABOVE the pointer —
    manifests without a pointer swap and orphan data dirs. Nothing a
    reader can reach is touched (readers resolve via the pointer)."""
    cur = current_version(root)
    floor = -1 if cur is None else cur
    for m in glob.glob(os.path.join(root, "manifests", "v*.json")):
        if int(os.path.basename(m)[1:-5]) > floor:
            os.remove(m)
    for d in glob.glob(os.path.join(root, "data", "v*")):
        if os.path.isdir(d) and int(os.path.basename(d)[1:]) > floor:
            shutil.rmtree(d)


def commit_version(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
) -> int:
    """Commit ``df`` as the next version of the table at ``root`` and
    return the new version number.

    ``mode="overwrite"``: the new version IS ``df`` (its files alone).
    ``mode="append"``: the new version = parent's files + ``df``'s new
    files — the parent's data is REUSED, never rewritten or re-read,
    so an ingest commit costs O(batch).

    Protocol (single writer): repair stale leftovers → write data
    files under ``data/v{n}`` → row-count-verify the written files by
    re-reading them (the compact_parquet posture: a short write never
    becomes a version) → write the manifest → atomically swap the
    pointer. A crash anywhere before the final ``os.replace`` leaves
    the previous version intact and current."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"commit_version: unknown mode {mode!r}")
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    _repair(root)
    cur = current_version(root)
    n = 0 if cur is None else cur + 1
    if mode == "append" and cur is None:
        mode = "overwrite"  # first commit of an append stream

    spark = df.sparkSession
    data_dir = os.path.join(root, "data", f"v{n:06d}")
    expected = df.count()
    df.write.mode("overwrite").parquet(data_dir)
    new_files = sorted(
        glob.glob(os.path.join(data_dir, "*.parquet"))
    )
    n_new = spark.read.parquet(data_dir).count() if new_files else 0
    if n_new != expected:
        shutil.rmtree(data_dir)
        raise IOError(
            f"commit_version: wrote {n_new} rows to {data_dir}, expected "
            f"{expected}; commit aborted, table still at version {cur}."
        )
    files = list(new_files)
    n_rows = n_new
    if mode == "append":
        parent = read_manifest(root, cur)
        files = parent["files"] + new_files
        n_rows = parent["n_rows"] + n_new

    manifest = {
        "version": n,
        "parent": cur,
        "mode": mode,
        "files": files,
        "n_rows": n_rows,
        "n_new_files": len(new_files),
    }
    mpath = _manifest_path(root, n)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)

    ptmp = os.path.join(root, _POINTER + ".tmp")
    with open(ptmp, "w") as f:
        f.write(str(n))
    os.replace(ptmp, os.path.join(root, _POINTER))
    return n


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: current). Resolves the
    pointer/manifest once, then scans only the manifest's immutable
    files — snapshot-isolated against concurrent commits by
    construction. Raises loudly on a never-committed table or an
    expired/unknown version."""
    n = current_version(root) if version is None else int(version)
    if n is None:
        raise FileNotFoundError(f"versioned table at {root} has no commits")
    mpath = _manifest_path(root, n)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"version {n} of {root} does not exist (expired or never "
            f"committed); available: {list_versions(root)}"
        )
    manifest = read_manifest(root, n)
    if not manifest["files"]:
        raise ValueError(f"version {n} of {root} lists no files")
    return spark.read.parquet(*manifest["files"])


def expire_versions(root: str, keep_last: int) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions and delete data files no kept version references.
    Returns the expired version numbers. Destructive by contract —
    run it from the single writer; a reader still holding an expired
    version's manifest fails loudly mid-scan (missing file), it never
    silently sees partial data."""
    if keep_last < 1:
        raise ValueError("expire_versions: keep_last must be >= 1")
    versions = list_versions(root)
    expired = versions[:-keep_last]
    if not expired:
        return []
    kept_files: set[str] = set()
    for n in versions[-keep_last:]:
        kept_files.update(read_manifest(root, n)["files"])
    doomed_files: set[str] = set()
    for n in expired:
        doomed_files.update(read_manifest(root, n)["files"])
    for f in sorted(doomed_files - kept_files):
        if os.path.exists(f):
            os.remove(f)
    for n in expired:
        os.remove(_manifest_path(root, n))
    # drop data dirs that emptied out
    for d in glob.glob(os.path.join(root, "data", "v*")):
        if os.path.isdir(d) and not glob.glob(os.path.join(d, "*.parquet")):
            shutil.rmtree(d)
    return expired
