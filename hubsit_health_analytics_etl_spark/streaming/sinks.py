"""Streaming sinks — foreachBatch upsert (merge) into a keyed parquet
snapshot.

Structured Streaming's file sink is append-only; pipelines that
maintain a "current state per key" table (latest document version,
user profile, dimension snapshot) need merge semantics. Without a
transactional table format in this container, the pattern is
demonstrated with a read-merge-rewrite of a parquet snapshot inside
``foreachBatch`` — the orchestration (micro-batch boundary,
latest-wins resolution, idempotent re-run) is exactly what a
Delta/Iceberg ``MERGE INTO`` would receive at scale; swap
``_rewrite_snapshot`` for the table format's merge and everything
else stands. The full-snapshot rewrite itself is the documented
non-scalable edge (fine for dimension-sized state, not for 100 TB
fact state — :func:`partitioned_upsert_sink` is that path: hash-bucket
directory partitions, only touched buckets rewritten per batch). The
manifest-pointer upgrade is WIRED IN as
:func:`versioned_upsert_sink`: each micro-batch commits a version via
``sources/versioned.py::commit_version`` with its batch_id in the
manifest — snapshot-isolated concurrent readers, atomic commits, and
batch-id replay idempotence (tests/test_streaming_dedup_sinks.py +
tests/test_versioned.py pin all three).

Idempotence: resolution is latest-wins on (ts, tiebreak key order),
a pure function of the DATA, not of batch boundaries — so replaying
micro-batches after a failure converges to the same snapshot.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def latest_wins(
    df: DataFrame, key_cols: Sequence[str], ts_col: str
) -> DataFrame:
    """One row per key: greatest ``ts_col`` wins. Timestamp ties break
    on a hash of the ENTIRE row — a pure function of the data, so the
    winner is identical on every replay/repartition (ordering by the
    partition keys would be a no-op: they are constant within the
    window partition)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.xxhash64(*df.columns).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_batch(
    batch: DataFrame, path: str, key_cols: Sequence[str], ts_col: str
) -> None:
    """Merge one (micro-)batch into the parquet snapshot at ``path``:
    union existing snapshot + batch, keep latest per key, swap the
    directory (write tmp → move). Crash-safe ordering: the previous
    snapshot is renamed aside only AFTER the new one is fully written,
    and a dangling ``._old`` from a crash between the two renames is
    recovered on the next call instead of silently rebuilding from one
    batch.

    Scope limits (documented, accepted for the local-snapshot demo):
    CONCURRENT readers can observe a missing snapshot in the instant
    between rename(path → ._old) and rename(._tmp → path) — writers are
    crash-safe, readers are not isolated. And ``os.rename`` requires
    tmp/old/path on one filesystem. A production deployment swaps a
    versioned directory behind a pointer file (or uses a table format
    with atomic commits — Delta/Iceberg) instead."""
    spark = batch.sparkSession
    old = path + "._old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)  # crash after swap completed — stale
        else:
            os.rename(old, path)  # crash between the renames — recover
    if os.path.exists(path):
        merged = spark.read.parquet(path).unionByName(batch)
    else:
        merged = batch
    resolved = latest_wins(merged, key_cols, ts_col)
    tmp = path + "._tmp"
    resolved.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def upsert_sink(
    path: str, key_cols: Sequence[str], ts_col: str
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable maintaining a latest-wins snapshot:

        stream.writeStream.foreachBatch(upsert_sink(p, ["k"], "ts"))
    """

    def _apply(batch: DataFrame, batch_id: int) -> None:
        upsert_batch(batch, path, key_cols, ts_col)

    return _apply


def partitioned_upsert_sink(
    path: str,
    key_cols: Sequence[str],
    ts_col: str,
    n_buckets: int = 32,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` merge for FACT-sized state — the partitioned
    merge target :func:`upsert_sink`'s full-snapshot rewrite documents
    itself as lacking. The snapshot is a hash-bucketed parquet table
    (``_bucket = xxhash64(keys) pmod n_buckets`` directory partitions);
    a micro-batch rewrites ONLY the buckets its keys land in:

      1. stamp the batch with its bucket (map-side);
      2. read back JUST those bucket partitions (partition-pruned scan
         — the other ``n_buckets - len(touched)`` partitions are never
         listed, let alone read);
      3. latest-wins within the union (per key, pure function of the
         data — replay-idempotent);
      4. dynamic-partition-overwrite the touched buckets in place.

    Per-batch cost ∝ touched-bucket bytes, not table bytes: with
    ``n_buckets`` sized so a bucket fits an executor comfortably
    (≈ table_bytes / n_buckets), a small batch touching b buckets
    rewrites b/n_buckets of the table instead of all of it. At 100 TB
    raise ``n_buckets`` (buckets are independent — the merge
    parallelizes per bucket, no global shuffle of the table).

    ``n_buckets`` is part of the TABLE layout: it must stay constant
    for the table's lifetime (enforced by a `_n_buckets` marker file —
    changing it silently would split a key across two buckets and
    latest-wins would never see both versions).

    Crash/replay: dynamic partition overwrite rewrites exactly the
    touched partitions; re-running a delivered batch recomputes the
    identical bucket contents (latest-wins is order-free), so
    at-least-once delivery yields exactly-once state — the fanout_sink
    argument, per bucket. Readers of untouched buckets are unaffected;
    readers racing a touched-bucket rewrite get the directory-swap
    caveat — front with the versioned layout when that matters.
    """
    if n_buckets < 1:
        raise ValueError("partitioned_upsert_sink: n_buckets must be >= 1")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            # foreachBatch delivers empty batches (idle triggers); a
            # zero-row first write would create a schema-less dir the
            # next batch cannot read back
            return
        spark = batch.sparkSession
        marker = os.path.join(path, "_n_buckets")
        if os.path.exists(marker):
            with open(marker) as f:
                existing = int(f.read().strip())
            if existing != n_buckets:
                raise ValueError(
                    f"partitioned_upsert_sink: table at {path} was laid "
                    f"out with n_buckets={existing}, got {n_buckets} — "
                    "bucket count is immutable for a table's lifetime"
                )
        stamped = batch.withColumn(
            "_bucket",
            F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int"),
        )
        touched = sorted(
            r._bucket for r in stamped.select("_bucket").distinct().collect()
        )
        exists = os.path.exists(marker)
        if exists:
            current = spark.read.parquet(path).filter(
                F.col("_bucket").isin(touched)
            )
            merged = current.unionByName(stamped)
        else:
            merged = stamped
        resolved = latest_wins(merged, key_cols, ts_col)
        (
            resolved.repartition(max(len(touched), 1), "_bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(path)
        )
        if not exists:
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(n_buckets))
            os.replace(tmp, marker)

    return _apply


def versioned_upsert_sink(
    root: str, key_cols: Sequence[str], ts_col: str
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable maintaining the SAME latest-wins state
    as :func:`upsert_sink`, but committing every micro-batch as a new
    VERSION of the manifest-pointer table at ``root``
    (sources/versioned.py) — the upgrade upsert_sink's docstring
    points at, wired in:

    - concurrent readers are snapshot-isolated: a reader that resolved
      version n keeps reading n's immutable files while commits land
      (the full-snapshot directory swap's documented gap, closed);
    - replay idempotence by BATCH ID, not just by data: foreachBatch
      re-delivers a batch after a crash, so each commit records its
      ``batch_id`` in the manifest's ``extra`` — a re-delivered batch
      whose id matches the CURRENT version's is skipped outright
      (the Delta/Iceberg txn-version check), and a batch that crashed
      mid-commit left the pointer untouched (commit_version's repair
      protocol), so the replay simply commits again;
    - every micro-batch version stays time-travelable/diffable
      (read_version / snapshot_diff) until expire_versions retires it.

    The merged state is re-resolved per batch (read current + union +
    latest_wins) — dimension-sized state by contract, like upsert_sink;
    100 TB fact state takes :func:`partitioned_upsert_sink` instead.

        stream.writeStream.foreachBatch(
            versioned_upsert_sink(root, ["k"], "ts"))
    """

    def _apply(batch: DataFrame, batch_id: int) -> None:
        from ..sources.versioned import (
            commit_version,
            current_version,
            read_manifest,
            read_version,
        )

        if batch.isEmpty():
            # an empty first batch would commit a zero-file manifest
            # read_version rightly refuses; empty batches change no
            # state, so skipping them is replay-equivalent
            return
        cur = current_version(root)
        if cur is not None:
            if read_manifest(root, cur).get("extra", {}).get(
                "batch_id"
            ) == batch_id:
                return  # replayed, already-committed batch
            merged = read_version(batch.sparkSession, root).unionByName(
                batch
            )
        else:
            merged = batch
        commit_version(
            latest_wins(merged, key_cols, ts_col),
            root,
            extra={"batch_id": batch_id},
        )

    return _apply


def fanout_sink(paths: Sequence[str]) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable fanning each micro-batch out to N
    parquet targets (the lake + the serving copy + the audit trail —
    multi-sink writes Structured Streaming has no primitive for).

    Replay safety: foreachBatch re-delivers a batch after a crash, so
    a naive append duplicates rows in whichever sinks finished before
    the failure. Each sink therefore writes the batch into its OWN
    ``_batch_id`` partition with dynamic partition overwrite: a replay
    rewrites exactly that partition in place — at-least-once delivery,
    exactly-once state, per sink, no cross-sink transaction needed."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        stamped = batch.withColumn("_batch_id", F.lit(batch_id))
        for path in paths:
            (
                stamped.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(path)
            )

    return _apply
