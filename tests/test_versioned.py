"""sources/versioned.py — the manifest-pointer snapshot layout:
commit/time-travel round-trip, append file reuse, snapshot isolation
for concurrent readers, crash recovery, and retention semantics."""

from __future__ import annotations

import glob
import json
import os
import time

import pytest

from hubsit_health_analytics_etl_spark.sources.versioned import (
    _abs_file,
    commit_version,
    current_version,
    expire_versions,
    list_versions,
    read_manifest,
    read_version,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def test_commit_and_time_travel_roundtrip(spark, tmp_path):
    root = str(tmp_path / "tbl")
    assert current_version(root) is None
    with pytest.raises(FileNotFoundError):
        read_version(spark, root)

    assert commit_version(_mk(spark, [(1, "a"), (2, "b")]), root) == 0
    assert commit_version(
        _mk(spark, [(3, "c")]), root, mode="append"
    ) == 1
    assert commit_version(_mk(spark, [(9, "z")]), root) == 2  # overwrite

    assert current_version(root) == 2
    assert list_versions(root) == [0, 1, 2]
    get = lambda n: sorted(
        (r.k, r.v) for r in read_version(spark, root, n).collect()
    )
    assert get(0) == [(1, "a"), (2, "b")]
    assert get(1) == [(1, "a"), (2, "b"), (3, "c")]
    assert get(2) == [(9, "z")]
    # default read = current
    assert sorted(
        (r.k, r.v) for r in read_version(spark, root).collect()
    ) == [(9, "z")]


def test_append_reuses_parent_files_untouched(spark, tmp_path):
    """An append commit must not rewrite or re-reference-by-copy the
    parent's data: v1's manifest contains v0's exact file paths, and
    those files' bytes are untouched on disk."""
    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a"), (2, "b")]), root)
    # manifest entries are ROOT-RELATIVE (Iceberg-style)
    v0_files = read_manifest(root, 0)["files"]
    assert all(not os.path.isabs(f) for f in v0_files)
    stamps = {
        f: (os.path.getmtime(_abs_file(root, f)), os.path.getsize(_abs_file(root, f)))
        for f in v0_files
    }
    commit_version(_mk(spark, [(3, "c")]), root, mode="append")
    m1 = read_manifest(root, 1)
    assert set(v0_files) <= set(m1["files"])
    for f, (mt, sz) in stamps.items():
        a = _abs_file(root, f)
        assert (os.path.getmtime(a), os.path.getsize(a)) == (mt, sz)
    assert m1["n_rows"] == 3 and m1["parent"] == 0


def test_concurrent_reader_is_snapshot_isolated(spark, tmp_path):
    """A reader that resolved a version BEFORE a new commit keeps
    seeing exactly its version's rows afterwards — the property the
    plain full-snapshot-rewrite sink cannot give (its readers race
    the directory swap)."""
    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "old")]), root)
    reader = read_version(spark, root)  # lazy plan, resolved against v0
    commit_version(_mk(spark, [(2, "new")]), root)  # overwrite → v1
    assert [(r.k, r.v) for r in reader.collect()] == [(1, "old")]
    assert [(r.k, r.v) for r in read_version(spark, root).collect()] == [
        (2, "new")
    ]


def test_crashed_commit_is_invisible_and_repaired(spark, tmp_path):
    """A crash after data+manifest but BEFORE the pointer swap leaves
    the table at its old version. Once the crash is older than the
    repair grace (the live-CAS-to-pointer-swap window is milliseconds),
    the next commit clears the stale manifest and takes the version
    number cleanly; the crashed data dir is GC'd by expire_versions
    (never swept at commit entry — it could be a live racing writer's
    staging, ADVICE r12)."""
    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root)

    # simulate the crashed commit: data dir + manifest for v1 exist,
    # pointer still says 0; backdate mtimes past both grace windows
    stale_data = os.path.join(root, "data", "v000001")
    os.makedirs(stale_data)
    with open(os.path.join(stale_data, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    stale_manifest = os.path.join(root, "manifests", "v000001.json")
    with open(stale_manifest, "w") as f:
        json.dump({"version": 1, "parent": 0, "mode": "overwrite",
                   "files": [os.path.join(stale_data, "garbage.parquet")],
                   "n_rows": 99, "n_new_files": 1}, f)
    long_ago = time.time() - 7200
    os.utime(stale_manifest, (long_ago, long_ago))
    os.utime(stale_data, (long_ago, long_ago))

    assert current_version(root) == 0
    assert list_versions(root) == [0]  # stale manifest not reachable
    # table still reads fine at v0
    assert [(r.k, r.v) for r in read_version(spark, root).collect()] == [
        (1, "a")
    ]
    # next commit repairs the crashed manifest and becomes the real v1
    assert commit_version(_mk(spark, [(2, "b")]), root) == 1
    assert [(r.k, r.v) for r in read_version(spark, root, 1).collect()] == [
        (2, "b")
    ]
    # the crashed data dir is disk garbage until retention GCs it:
    # unreferenced by any surviving manifest → file + dir removed
    assert os.path.exists(os.path.join(stale_data, "garbage.parquet"))
    assert expire_versions(root, keep_last=10) == []
    assert not os.path.exists(stale_data)
    # ... and the real versions still read
    assert [(r.k, r.v) for r in read_version(spark, root, 1).collect()] == [
        (2, "b")
    ]


def test_fresh_crashed_manifest_refuses_then_repairs_after_grace(
    spark, tmp_path
):
    """A manifest above the pointer YOUNGER than the grace might be a
    live racing writer an instant from its pointer swap — commit must
    refuse (retryable), not sweep it. After the grace it is a crashed
    commit and the retry succeeds."""
    from hubsit_health_analytics_etl_spark.sources import versioned as V

    root = str(tmp_path / "fresh")
    commit_version(_mk(spark, [(1, "a")]), root)
    mpath = os.path.join(root, "manifests", "v000001.json")
    with open(mpath, "w") as f:
        json.dump(dict(read_manifest(root, 0), version=1, parent=0), f)

    with pytest.raises(V.ConcurrentWriteError):
        commit_version(_mk(spark, [(2, "b")]), root)
    assert current_version(root) == 0  # refused cleanly

    old = time.time() - 2 * V._CRASH_GRACE_S
    os.utime(mpath, (old, old))
    assert commit_version(_mk(spark, [(2, "b")]), root) == 1
    assert [(r.k, r.v) for r in read_version(spark, root, 1).collect()] == [
        (2, "b")
    ]


def test_commit_entry_never_sweeps_a_racing_writers_staging(
    spark, tmp_path
):
    """The ADVICE r12 high finding: writer A is mid-write in its own
    token-suffixed staging dir above the pointer when writer B enters
    commit. B must NOT delete A's staged files (the old sweep did,
    letting A later publish a manifest referencing deleted files)."""
    root = str(tmp_path / "staging")
    commit_version(_mk(spark, [(1, "a")]), root)

    # A's in-flight staging for v1: token-suffixed, fresh
    a_dir = os.path.join(root, "data", "v000001_aaaaaaaa")
    os.makedirs(a_dir)
    a_file = os.path.join(a_dir, "part-00000.parquet")
    with open(a_file, "w") as f:
        f.write("A's in-flight bytes")

    # B commits (wins v1 under its own token) — A's staging survives
    # the commit-entry repair; A will be refused at its own pointer
    # re-check, never publish a manifest over deleted files
    assert commit_version(_mk(spark, [(2, "B")]), root) == 1
    assert os.path.exists(a_file)

    # C's in-flight staging for v2 (above the pointer): survives both
    # another commit-entry repair and retention while fresh
    c_dir = os.path.join(root, "data", "v000002_cccccccc")
    os.makedirs(c_dir)
    c_file = os.path.join(c_dir, "part-00000.parquet")
    with open(c_file, "w") as f:
        f.write("C's in-flight bytes")
    assert expire_versions(root, keep_last=10) == []
    assert os.path.exists(c_file)
    # A's dir sits at a version ≤ the pointer: dead by protocol (the
    # v1 manifest CAS is taken, A can never publish) → retention GCs
    # it without any age gate
    assert not os.path.exists(a_dir)
    # once C is long-dead (past the orphan grace), retention GCs it too
    long_ago = time.time() - 7200
    os.utime(c_dir, (long_ago, long_ago))
    expire_versions(root, keep_last=10, orphan_grace_s=3600)
    assert not os.path.exists(c_dir)
    assert [(r.k, r.v) for r in read_version(spark, root).collect()] == [
        (2, "B")
    ]


def test_expire_sweep_never_touches_foreign_named_dirs(spark, tmp_path):
    """The empty-dir sweep honors _data_dir_version's -1 protection:
    a foreign-named dir under data/ (even empty, even old) survives
    every retention pass."""
    root = str(tmp_path / "foreign")
    commit_version(_mk(spark, [(1, "a")]), root)
    foreign = os.path.join(root, "data", "vendor_scratch")
    os.makedirs(foreign)
    long_ago = time.time() - 7200
    os.utime(foreign, (long_ago, long_ago))
    commit_version(_mk(spark, [(2, "b")]), root)
    expire_versions(root, keep_last=1, orphan_grace_s=0.0)
    assert os.path.isdir(foreign)


def test_expire_versions_keeps_shared_files(spark, tmp_path):
    """Retention drops old manifests and unreferenced files ONLY:
    expiring v0 while v1 (an append) still references v0's data files
    must keep those files; reading the expired version fails loudly;
    kept versions read unchanged."""
    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root)
    commit_version(_mk(spark, [(2, "b")]), root, mode="append")
    commit_version(_mk(spark, [(3, "c")]), root, mode="append")
    v0_files = read_manifest(root, 0)["files"]

    assert expire_versions(root, keep_last=2) == [0]
    assert list_versions(root) == [1, 2]
    for f in v0_files:  # shared with v1/v2 → must survive
        assert os.path.exists(_abs_file(root, f))
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 0)
    assert sorted(
        (r.k, r.v) for r in read_version(spark, root, 2).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]

    # expiring down to the overwritten head DOES delete orphaned files
    commit_version(_mk(spark, [(9, "z")]), root)  # v3 overwrite
    assert expire_versions(root, keep_last=1) == [1, 2]
    remaining = glob.glob(os.path.join(root, "data", "*", "*.parquet"))
    assert set(remaining) == {
        _abs_file(root, f) for f in read_manifest(root, 3)["files"]
    }
    assert [(r.k, r.v) for r in read_version(spark, root).collect()] == [
        (9, "z")
    ]


def test_short_write_never_becomes_a_version(spark, tmp_path, monkeypatch):
    """commit_version verifies the written row count before the
    manifest exists: a write that lands fewer rows than the batch
    aborts loudly and the table stays at its previous version."""
    import hubsit_health_analytics_etl_spark.sources.versioned as V

    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root)

    real_read = type(spark.read).parquet

    def short_read(self, *paths):
        df = real_read(self, *paths)
        return df.limit(0) if "v000001" in paths[0] else df

    monkeypatch.setattr(type(spark.read), "parquet", short_read)
    with pytest.raises(IOError, match="expected"):
        commit_version(_mk(spark, [(2, "b")]), root)
    monkeypatch.undo()
    assert current_version(root) == 0
    assert [(r.k, r.v) for r in read_version(spark, root).collect()] == [
        (1, "a")
    ]


def test_manifest_stats_prune_file_reads(spark, tmp_path):
    """Per-file min/max stats in the manifest turn a selective range
    predicate into manifest-level file pruning: with the table range-
    partitioned on k, read_version(..., predicate=) must scan FEWER
    files than the manifest lists, and the result must equal the
    unpruned read with the same row filter."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 1000).selectExpr("id AS k", "cast(id as string) AS v")
    commit_version(
        df.repartitionByRange(4, "k"), root, stats_cols=["k"]
    )
    m = read_manifest(root, 0)
    assert len(m["files"]) == 4
    assert all("k" in st for st in m["stats"].values())

    pruned = read_version(spark, root, predicate=("k", 100, 120))
    assert len(pruned.inputFiles()) < len(m["files"])
    expected = sorted(
        (r.k, r.v)
        for r in read_version(spark, root)
        .filter("k BETWEEN 100 AND 120")
        .collect()
    )
    assert sorted((r.k, r.v) for r in pruned.collect()) == expected

    # open-ended ranges prune too; a file without stats is never pruned
    assert len(
        read_version(spark, root, predicate=("k", 900, None)).inputFiles()
    ) < 4
    assert len(
        read_version(spark, root, predicate=("v", 0, 1)).inputFiles()
    ) == 4  # no stats collected for v → safe, nothing pruned

    # fully-disjoint predicate returns zero rows without losing schema
    empty = read_version(spark, root, predicate=("k", 5000, 6000))
    assert empty.count() == 0
    assert empty.columns == ["k", "v"]


def test_root_relative_manifests_survive_table_move(spark, tmp_path):
    """Manifests store root-relative file paths: physically moving the
    whole table root must not invalidate a single version."""
    import shutil

    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root)
    commit_version(_mk(spark, [(2, "b")]), root, mode="append")
    moved = str(tmp_path / "elsewhere" / "tbl2")
    os.makedirs(os.path.dirname(moved))
    shutil.move(root, moved)
    assert sorted(
        (r.k, r.v) for r in read_version(spark, moved).collect()
    ) == [(1, "a"), (2, "b")]
    assert [(r.k, r.v) for r in read_version(spark, moved, 0).collect()] == [
        (1, "a")
    ]


def test_commit_records_extra_metadata(spark, tmp_path):
    """`extra` lands verbatim in the manifest (the streaming sink's
    batch-id replay check reads it back)."""
    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root, extra={"batch_id": 7})
    assert read_manifest(root, 0)["extra"] == {"batch_id": 7}


def test_versioned_pruned_read_query_scans_fewer_files(spark):
    """The registered versioned_pruned_read query actually prunes: its
    result plan reads fewer parquet files than the committed table's 8
    range-clustered files."""
    from .conftest import SF_SMOKE
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    out = QUERIES["versioned_pruned_read"](spark, SF_SMOKE)
    n_in = len(out.inputFiles())
    assert 1 <= n_in < 8, n_in


def test_compact_versioned_rewrites_files_keeps_history(spark, tmp_path):
    """compact_versioned: five 1-row append commits fragment the file
    list; compaction commits one new version with fewer files and the
    same rows, pre-compaction versions stay readable (snapshot
    isolation through maintenance), re-running is a no-op, and
    cluster_by carries fresh stats so pruning works on the compacted
    layout."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        compact_versioned,
    )

    root = str(tmp_path / "tbl")
    for i in range(5):
        commit_version(_mk(spark, [(i, f"v{i}")]), root, mode="append")
    assert len(read_manifest(root, 4)["files"]) >= 5  # fragmented

    v = compact_versioned(spark, root, cluster_by=["k"])
    assert v == 5
    m = read_manifest(root, 5)
    assert len(m["files"]) == 1
    assert m["extra"] == {"compaction_of": 4}
    assert m["stats"][m["files"][0]]["k"] == [0, 4]
    assert sorted(
        (r.k, r.v) for r in read_version(spark, root).collect()
    ) == [(i, f"v{i}") for i in range(5)]
    # pre-compaction history intact
    assert sorted(r.k for r in read_version(spark, root, 2).collect()) == [0, 1, 2]
    # idempotent: already compact -> no new version
    assert compact_versioned(spark, root) == 5
    assert current_version(root) == 5
    # retention then drops the uncompacted files (data dirs carry a
    # per-attempt unique token since the r12 concurrency guard)
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        _data_dir_version,
    )

    expire_versions(root, keep_last=1)
    assert [
        _data_dir_version(d)
        for d in sorted(glob.glob(os.path.join(root, "data", "v*")))
    ] == [5]


def test_stats_pruning_degrades_safely_on_uncomparable_predicate(spark, tmp_path):
    """A predicate whose bounds cannot compare with the stored stats
    type (datetime vs ISO string) must fall back to reading everything
    with the row filter applied — never a TypeError mid-read."""
    import datetime as dt

    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 10, 0), 1), (dt.datetime(2025, 6, 1, 10, 0), 2)],
        "ts timestamp, k long",
    )
    commit_version(df.repartitionByRange(2, "ts"), root, stats_cols=["ts"])
    out = read_version(
        spark,
        root,
        predicate=("ts", dt.datetime(2025, 5, 1), None),
    )
    assert len(out.inputFiles()) == 2  # uncomparable -> nothing pruned
    assert [r.k for r in out.collect()] == [2]  # row filter still exact


def test_empty_overwrite_commit_roundtrips(spark, tmp_path):
    """A legitimate delete-all snapshot (overwrite-commit of an empty
    frame) must read back as zero rows WITH the schema, and time
    travel to the pre-delete version still works."""
    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root)
    n = commit_version(
        spark.createDataFrame([], "k bigint, v string"), root
    )
    cur = read_version(spark, root, n)
    assert cur.count() == 0 and cur.columns == ["k", "v"]
    assert [(r.k, r.v) for r in read_version(spark, root, 0).collect()] == [
        (1, "a")
    ]


def test_zorder_compaction_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering: after zorder compaction on (x, y), a
    selective range predicate on EITHER column prunes files —
    lexicographic clustering can only prune the leading column (pinned
    as the contrast). Results stay exact either way."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        compact_versioned,
        read_manifest,
    )

    root = str(tmp_path / "z")
    grid = spark.range(0, 4096).selectExpr(
        "cast(id % 64 as bigint) AS x",
        "cast(id div 64 as bigint) AS y",
        "id AS payload",
    )
    # fragment first so compaction has work to do
    commit_version(grid.repartition(16), root)
    v = compact_versioned(
        spark, root, target_file_bytes=4 << 10,
        cluster_by=["x", "y"], zorder=True,
    )
    n_files = len(read_manifest(root, v)["files"])
    assert n_files >= 8  # enough granularity for pruning to show

    for col in ("x", "y"):
        pruned = read_version(spark, root, predicate=(col, 0, 7))
        assert len(pruned.inputFiles()) < n_files, col
        assert pruned.count() == 4096 // 8  # exact rows, both dims

    # contrast: lexicographic (x, y) clustering cannot prune on y
    root2 = str(tmp_path / "lex")
    commit_version(grid.repartition(16), root2)
    v2 = compact_versioned(
        spark, root2, target_file_bytes=4 << 10, cluster_by=["x", "y"]
    )
    n2 = len(read_manifest(root2, v2)["files"])
    assert len(
        read_version(spark, root2, predicate=("x", 0, 7)).inputFiles()
    ) < n2
    assert len(
        read_version(spark, root2, predicate=("y", 0, 7)).inputFiles()
    ) == n2


def test_zorder_value_interleaves_bits(spark):
    """Independent check of the Morton key: interleaved-bit reference
    in Python over a sample grid."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        zorder_value,
    )

    def ref(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in (0, 1, 2, 5, 255, 65535) for y in (0, 3, 7, 1024)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_value(["x", "y"])).collect()
    }
    assert got == {(x, y): ref(x, y) for x, y in rows}


def test_versioned_zorder_read_query_prunes_on_second_dimension(spark):
    """The registered z-order query prunes on pb — the non-leading
    dimension — reading fewer files than committed."""
    from .conftest import SF_SMOKE
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    out = QUERIES["versioned_zorder_read"](spark, SF_SMOKE)
    assert 1 <= len(out.inputFiles()) < 8


def test_history_and_timestamp_time_travel(spark, tmp_path):
    """table_history lists every commit with counts + wall clock;
    read_version_as_of resolves the newest version committed at or
    before the asked time, raises before the first commit, and treats
    timestamp-less legacy manifests as never matching."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        read_version_as_of,
        table_history,
    )

    root = str(tmp_path / "tbl")
    commit_version(_mk(spark, [(1, "a")]), root)
    commit_version(_mk(spark, [(2, "b")]), root, mode="append")
    h = table_history(root)
    assert [r["version"] for r in h] == [0, 1]
    assert h[1]["mode"] == "append" and h[1]["n_rows"] == 2
    t0, t1 = h[0]["committed_at"], h[1]["committed_at"]
    assert t0 is not None and t1 is not None and t0 <= t1

    assert sorted(
        r.k for r in read_version_as_of(spark, root, t0).collect()
    ) == [1]
    assert sorted(
        r.k for r in read_version_as_of(spark, root, t1 + 60).collect()
    ) == [1, 2]
    with pytest.raises(FileNotFoundError):
        read_version_as_of(spark, root, t0 - 60)

    # legacy manifest without committed_at is timeless: as-of skips it
    m = read_manifest(root, 0)
    del m["committed_at"]
    with open(os.path.join(root, "manifests", "v000000.json"), "w") as f:
        json.dump(m, f)
    assert sorted(
        r.k for r in read_version_as_of(spark, root, t1 + 60).collect()
    ) == [1, 2]
    with pytest.raises(FileNotFoundError):
        read_version_as_of(spark, root, t0)  # v0 now timeless, v1 later


def test_versioned_lifecycle_random_ops_match_python_model(spark, tmp_path):
    """Model-based check of the whole table-format lifecycle: a seeded
    random sequence of overwrite/append commits, compactions and
    retention runs against a trivial Python model (version -> row
    multiset). After every op, the current read AND a sample of
    time-travel reads must equal the model; expired versions must
    raise. Catches interaction bugs no single-feature test sees."""
    import random

    from hubsit_health_analytics_etl_spark.sources.versioned import (
        compact_versioned,
    )

    rng = random.Random(7)
    root = str(tmp_path / "tbl")
    model: dict[int, list] = {}  # version -> sorted row list
    expired: set[int] = set()
    next_k = 0

    def fresh_rows(n):
        nonlocal next_k
        rows = [(next_k + i, f"v{next_k + i}") for i in range(n)]
        next_k += n
        return rows

    for step in range(14):
        op = rng.choice(["overwrite", "append", "append", "compact", "expire"])
        cur = max(model) if model else None
        if op in ("overwrite", "append") or cur is None:
            rows = fresh_rows(rng.randint(1, 4))
            mode = "append" if (op == "append" and cur is not None) else "overwrite"
            v = commit_version(_mk(spark, rows), root, mode=mode)
            base = model[cur] if mode == "append" else []
            model[v] = sorted(base + rows)
        elif op == "compact":
            # huge target -> single-file rewrite (no-op if already 1)
            v = compact_versioned(spark, root, target_file_bytes=1 << 40)
            if v not in model:
                model[v] = model[cur]
        else:
            keep = rng.randint(1, len(model) - len(expired))
            gone = expire_versions(root, keep_last=keep)
            expired.update(gone)

        live = sorted(set(model) - expired)
        assert current_version(root) == live[-1]
        got = sorted(
            (r.k, r.v) for r in read_version(spark, root).collect()
        )
        assert got == model[live[-1]], f"step {step}"
        probe = rng.choice(live)
        assert sorted(
            (r.k, r.v) for r in read_version(spark, root, probe).collect()
        ) == model[probe]
        if expired:
            with pytest.raises(FileNotFoundError):
                read_version(spark, root, sorted(expired)[0])


def test_two_writer_race_second_committer_refused(spark, tmp_path):
    """Optimistic concurrency (r11 verdict #3): writer A reads the
    table at version v and derives a batch; writer B commits first;
    A's commit with expected_parent=v must be REFUSED loudly, the
    table must remain exactly at B's commit, and A must leave no
    orphan manifests or data dirs above the pointer."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        ConcurrentWriteError,
    )

    root = str(tmp_path / "race")
    commit_version(_mk(spark, [(1, "a")]), root)

    # writer A snapshots the table ...
    a_parent = current_version(root)
    a_batch = _mk(spark, [(1, "a"), (2, "A-side")])
    # ... writer B lands a commit in between
    b_version = commit_version(
        _mk(spark, [(1, "a"), (3, "B-side")]), root
    )
    assert b_version == 1

    with pytest.raises(ConcurrentWriteError):
        commit_version(a_batch, root, expected_parent=a_parent)

    # table state is exactly the first (winning) commit
    assert current_version(root) == b_version
    got = sorted((r.k, r.v) for r in read_version(spark, root).collect())
    assert got == [(1, "a"), (3, "B-side")]
    # no orphans above the pointer: no manifest v2+, no data dir v2+
    top = max(
        int(os.path.basename(m)[1:-5])
        for m in glob.glob(os.path.join(root, "manifests", "v*.json"))
    )
    assert top == b_version
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        _data_dir_version,
    )

    assert all(
        _data_dir_version(d) <= b_version
        for d in glob.glob(os.path.join(root, "data", "v*"))
    )


def test_pointer_moved_mid_commit_is_refused_with_cleanup(
    spark, tmp_path, monkeypatch
):
    """The pre-publish guard: if the pointer moves while a commit is
    writing its data files (a racing writer that landed after our
    entry snapshot), the commit must refuse before publishing and
    remove its own data dir."""
    from hubsit_health_analytics_etl_spark.sources import versioned as V

    root = str(tmp_path / "midrace")
    commit_version(_mk(spark, [(1, "a")]), root)

    real = V.current_version
    calls = {"n": 0}

    def racing(r):
        v = real(r)
        calls["n"] += 1
        # entry snapshot (call 1) sees the true version; by the
        # pre-publish re-check a racing writer has bumped the pointer
        if calls["n"] >= 2 and v is not None:
            return v + 1
        return v

    monkeypatch.setattr(V, "current_version", racing)
    with pytest.raises(V.ConcurrentWriteError):
        V.commit_version(_mk(spark, [(2, "loser")]), root)
    monkeypatch.setattr(V, "current_version", real)

    # loser left nothing above the pointer and the table still reads
    assert current_version(root) == 0
    assert not glob.glob(os.path.join(root, "manifests", "v000001*"))
    assert all(
        V._data_dir_version(d) <= 0
        for d in glob.glob(os.path.join(root, "data", "v*"))
    )
    assert [r.k for r in read_version(spark, root).collect()] == [1]


def test_manifest_cas_refuses_duplicate_version(spark, tmp_path):
    """The hardlink CAS: if manifest n already exists (a concurrent
    writer published it between our pointer re-check and our publish),
    the commit is refused and cleaned up — two writers can never both
    publish version n."""
    from hubsit_health_analytics_etl_spark.sources import versioned as V

    root = str(tmp_path / "cas")
    commit_version(_mk(spark, [(1, "a")]), root)
    # plant a winner's manifest at the version the next commit wants,
    # without moving the pointer (the narrow CAS window)
    winner = dict(read_manifest(root, 0), version=1, parent=0)
    with open(os.path.join(root, "manifests", "v000001.json"), "w") as f:
        json.dump(winner, f)

    # _repair would normally clear above-pointer garbage at entry; the
    # CAS matters for a manifest that appears AFTER entry. Disable
    # repair to model that interleaving deterministically.
    import unittest.mock as mock

    with mock.patch.object(V, "_repair", lambda r: None):
        with pytest.raises(V.ConcurrentWriteError):
            V.commit_version(_mk(spark, [(2, "loser")]), root)

    assert current_version(root) == 0
    assert all(
        V._data_dir_version(d) <= 0
        for d in glob.glob(os.path.join(root, "data", "v*"))
    )


def test_append_rejects_incompatible_retype_of_shared_column(spark, tmp_path):
    """ADVICE r11: an append whose batch retypes a shared column used
    to commit successfully and leave the CURRENT version unreadable
    (parent's parquet files fail under the unioned schema). It must be
    rejected at commit time, leaving the table untouched; adding a new
    column must still work."""
    root = str(tmp_path / "retype")
    commit_version(_mk(spark, [(1, "a")]), root)

    bad = spark.createDataFrame([("oops", "b")], "k string, v string")
    with pytest.raises(ValueError, match="retypes shared column"):
        commit_version(bad, root, mode="append")
    assert current_version(root) == 0
    assert sorted((r.k, r.v) for r in read_version(spark, root).collect()) == [
        (1, "a")
    ]

    ok = spark.createDataFrame(
        [(2, "b", 1.5)], "k bigint, v string, score double"
    )
    assert commit_version(ok, root, mode="append") == 1
    cur = read_version(spark, root)
    assert cur.columns == ["k", "v", "score"]
    assert {r.k: r.score for r in cur.collect()} == {1: None, 2: 1.5}


def test_zorder_value_refuses_wrapping_bit_budget(spark):
    """ADVICE r11: bits*len(cols) > 64 would wrap Java shift amounts
    mod 64 and silently scatter the layout — refuse loudly."""
    from hubsit_health_analytics_etl_spark.sources.versioned import zorder_value

    with pytest.raises(ValueError, match="64"):
        zorder_value(["a", "b", "c", "d", "e"], bits=16)
    # boundary: exactly 64 interleaved bits is fine
    zorder_value(["a", "b", "c", "d"], bits=16)


def test_manifest_blooms_prune_point_lookups(spark, tmp_path):
    """Per-file bloom filters in the manifest skip files on POINT
    lookups where min/max stats cannot (hash-scattered key): fewer
    files scanned, identical result, false-positive-only semantics
    (absent key → zero rows, schema intact), append commits carry the
    parent's blooms, and the stored bitset matches an independent
    Python bloom of the file's actual values."""
    import hashlib

    from hubsit_health_analytics_etl_spark.sources.versioned import (
        _BLOOM_K,
        read_manifest,
        read_version,
    )

    root = str(tmp_path / "tbl")
    df = spark.range(0, 2000).selectExpr("id AS k", "cast(id as string) AS v")
    # hash-repartition: every file holds a scattered slice of k — the
    # min/max span of each file covers ~everything, so only the bloom
    # can skip
    commit_version(df.repartition(8, "k"), root, bloom_cols=["k"])
    m = read_manifest(root, 0)
    assert len(m["files"]) == 8
    assert all("k" in b for b in m["blooms"].values())

    pruned = read_version(spark, root, point=("k", 42))
    assert len(pruned.inputFiles()) < 8
    assert [(r.k, r.v) for r in pruned.collect()] == [(42, "42")]

    # absent key: bloom proves absence for (nearly) every file; result
    # is empty either way and schema survives
    absent = read_version(spark, root, point=("k", 999_999))
    assert absent.count() == 0
    assert absent.columns == ["k", "v"]

    # independent reference: rebuild one file's bloom in pure Python
    rel, entry = next(iter(m["blooms"].items()))
    mm = entry["k"]["m"]
    ba = bytes.fromhex(entry["k"]["bits"])
    vals = [
        r.k
        for r in spark.read.parquet(os.path.join(root, rel)).collect()
    ]
    want = bytearray(mm // 8)
    for val in vals:
        for i in range(_BLOOM_K):
            p = int(
                hashlib.md5(f"bloom{i}|{val}".encode()).hexdigest()[:15], 16
            ) % mm
            want[p >> 3] |= 1 << (p & 7)
    assert bytes(want) == ba

    # every present key is found (no false negatives, the contract)
    for probe in (0, 777, 1999):
        got = read_version(spark, root, point=("k", probe)).collect()
        assert [(r.k, r.v) for r in got] == [(probe, str(probe))]

    # append carries the parent's blooms and adds the batch's
    batch = spark.range(2000, 2100).selectExpr(
        "id AS k", "cast(id as string) AS v"
    )
    commit_version(batch, root, mode="append", bloom_cols=["k"])
    m1 = read_manifest(root, 1)
    assert set(m["blooms"]) <= set(m1["blooms"])
    got = read_version(spark, root, point=("k", 2050))
    assert [(r.k, r.v) for r in got.collect()] == [(2050, "2050")]
    assert len(got.inputFiles()) < len(m1["files"])


# ---------------------------------------------------------------------------
# Catalog layer: multi-table atomic commit (VERDICT r14 #4)
# ---------------------------------------------------------------------------
def _cat_imports():
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        ConcurrentWriteError,
        catalog_commit,
        catalog_current,
        catalog_data_dir,
        read_catalog,
        read_catalog_table,
    )

    return (
        ConcurrentWriteError,
        catalog_commit,
        catalog_current,
        catalog_data_dir,
        read_catalog,
        read_catalog_table,
    )


def test_catalog_commit_flips_all_members_together(spark, tmp_path):
    """The torn-state scenario the catalog exists for: a crash (or a
    reader) between two member-table commits must never observe a MIX
    of generations — the dump at its new version with the index at its
    old one."""
    _, catalog_commit, catalog_current, _, read_catalog, read_catalog_table = (
        _cat_imports()
    )
    cat = str(tmp_path / "cat")
    dump_root = os.path.join(cat, "tables", "dump")
    idx_root = os.path.join(cat, "tables", "idx")
    commit_version(_mk(spark, [(1, "d0")]), dump_root)
    commit_version(_mk(spark, [(1, "i0")]), idx_root)
    assert catalog_commit(cat, {"dump": 0, "idx": 0}, expected_parent=None) == 0

    # generation 1 advances the dump FIRST, then "crashes" before the
    # index commit + catalog swap: readers still resolve (dump v0,
    # idx v0) — fully consistent, no torn state
    commit_version(_mk(spark, [(2, "d1")]), dump_root)
    got = read_catalog(cat)
    assert {k: t["version"] for k, t in got["tables"].items()} == {
        "dump": 0,
        "idx": 0,
    }
    assert [r.v for r in read_catalog_table(spark, cat, "dump").collect()] == [
        "d0"
    ]

    # the recovered writer finishes: index commit + ONE catalog swap
    commit_version(_mk(spark, [(2, "i1")]), idx_root)
    assert catalog_commit(cat, {"dump": 1, "idx": 1}, expected_parent=0) == 1
    assert catalog_current(cat) == 1
    pair = {
        n: sorted(r.v for r in read_catalog_table(spark, cat, n).collect())
        for n in ("dump", "idx")
    }
    assert pair == {"dump": ["d1"], "idx": ["i1"]}
    # time travel: catalog v0 still names the OLD consistent pair
    old = read_catalog(cat, 0)["tables"]
    assert {k: t["version"] for k, t in old.items()} == {"dump": 0, "idx": 0}


def test_catalog_refuses_missing_member_version(spark, tmp_path):
    """A catalog must never point at an uncommitted table version —
    the entry check that makes commit-tables-then-catalog safe."""
    _, catalog_commit, catalog_current, _, _, _ = _cat_imports()
    cat = str(tmp_path / "cat")
    commit_version(_mk(spark, [(1, "a")]), os.path.join(cat, "tables", "t"))
    with pytest.raises(ValueError, match="no committed manifest"):
        catalog_commit(cat, {"t": 7}, expected_parent=None)
    assert catalog_current(cat) is None  # nothing published


def test_catalog_two_writers_expected_parent_cas(spark, tmp_path):
    """Two writers derive at catalog v0; the second commit is REFUSED
    (never silently lost), and the catalog stays at the winner's
    version set."""
    ConcurrentWriteError, catalog_commit, catalog_current, _, read_catalog, _ = (
        _cat_imports()
    )
    cat = str(tmp_path / "cat")
    troot = os.path.join(cat, "tables", "t")
    commit_version(_mk(spark, [(1, "a")]), troot)
    catalog_commit(cat, {"t": 0}, expected_parent=None)

    commit_version(_mk(spark, [(2, "w1")]), troot)  # writer 1's table v1
    commit_version(_mk(spark, [(3, "w2")]), troot)  # writer 2's table v2
    assert catalog_commit(cat, {"t": 1}, expected_parent=0) == 1
    with pytest.raises(ConcurrentWriteError):
        catalog_commit(cat, {"t": 2}, expected_parent=0)
    assert catalog_current(cat) == 1
    assert read_catalog(cat)["tables"]["t"]["version"] == 1


def test_catalog_manifest_cas_refuses_duplicate_version(spark, tmp_path):
    """Even without expected_parent, the hardlink create-exclusive on
    the catalog manifest lets at most one writer publish version n."""
    ConcurrentWriteError, catalog_commit, catalog_current, _, _, _ = (
        _cat_imports()
    )
    cat = str(tmp_path / "cat")
    troot = os.path.join(cat, "tables", "t")
    commit_version(_mk(spark, [(1, "a")]), troot)
    catalog_commit(cat, {"t": 0})
    # a racing writer already published catalog v1 (fresh mtime — the
    # age gate protects it from repair)
    os.makedirs(os.path.join(cat, "catalog"), exist_ok=True)
    with open(os.path.join(cat, "catalog", "v000001.json"), "w") as f:
        json.dump({"version": 1, "tables": {}}, f)
    with pytest.raises(ConcurrentWriteError):
        catalog_commit(cat, {"t": 0})
    assert catalog_current(cat) == 0


def test_catalog_crashed_manifest_repaired_after_grace(spark, tmp_path):
    """A STALE catalog manifest above the pointer (crashed writer) is
    age-gate-cleared at the next commit, unwedging the version number."""
    _, catalog_commit, catalog_current, _, read_catalog, _ = _cat_imports()
    cat = str(tmp_path / "cat")
    troot = os.path.join(cat, "tables", "t")
    commit_version(_mk(spark, [(1, "a")]), troot)
    catalog_commit(cat, {"t": 0})
    crashed = os.path.join(cat, "catalog", "v000001.json")
    with open(crashed, "w") as f:
        json.dump({"version": 1, "tables": {"t": {"root": "tables/t", "version": 99}}}, f)
    old = time.time() - 3600
    os.utime(crashed, (old, old))
    # readers never resolve the crashed manifest (pointer still at 0)
    assert read_catalog(cat)["version"] == 0
    commit_version(_mk(spark, [(2, "b")]), troot)
    assert catalog_commit(cat, {"t": 1}, expected_parent=0) == 1
    assert read_catalog(cat)["tables"]["t"]["version"] == 1


def test_catalog_data_dir_resolves_single_overwrite_dir(spark, tmp_path):
    """catalog_data_dir gives plain spark.read.parquet consumers (the
    w18 standing fixture) the committed immutable dir — and refuses on
    a multi-dir append history instead of returning a partial read."""
    _, catalog_commit, _, catalog_data_dir, _, _ = _cat_imports()
    cat = str(tmp_path / "cat")
    troot = os.path.join(cat, "tables", "t")
    commit_version(_mk(spark, [(1, "a"), (2, "b")]), troot)
    catalog_commit(cat, {"t": 0})
    d = catalog_data_dir(cat, "t")
    assert sorted(r.v for r in spark.read.parquet(d).collect()) == ["a", "b"]
    commit_version(_mk(spark, [(3, "c")]), troot, mode="append")
    catalog_commit(cat, {"t": 1}, expected_parent=0)
    with pytest.raises(ValueError, match="data dirs"):
        catalog_data_dir(cat, "t")


def test_catalog_expire_keeps_referenced_member_versions(spark, tmp_path):
    """Generation retention: catalog_expire(keep_last=1) drops the old
    catalog manifests AND expires each member down to the versions the
    kept generation references — the kept generation stays fully
    readable, expired generations fail loudly, and member versions
    newer than any reference (an in-flight writer's commit) survive."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        catalog_commit,
        catalog_current,
        catalog_expire,
        read_catalog,
        read_catalog_table,
    )

    cat = str(tmp_path / "cat")
    ta, tb = (os.path.join(cat, "tables", n) for n in ("a", "b"))
    for gen in range(3):
        commit_version(_mk(spark, [(gen, f"a{gen}")]), ta)
        commit_version(_mk(spark, [(gen, f"b{gen}")]), tb)
        catalog_commit(
            cat, {"a": gen, "b": gen},
            expected_parent=gen - 1 if gen else None,
        )
    # an in-flight writer's table commit, not yet in any generation
    commit_version(_mk(spark, [(9, "a-next")]), ta)

    out = catalog_expire(cat, keep_last=1)
    assert out["_catalog"] == [0, 1]
    assert out["a"] == [0, 1] and out["b"] == [0, 1]

    # kept generation fully readable; expired ones fail loudly
    assert catalog_current(cat) == 2
    assert [r.v for r in read_catalog_table(spark, cat, "a", n=2).collect()] == ["a2"]
    with pytest.raises(FileNotFoundError):
        read_catalog(cat, 0)
    with pytest.raises(FileNotFoundError):
        read_version(spark, ta, 0)
    # the in-flight commit above the last reference survived
    assert [r.v for r in read_version(spark, ta, 3).collect()] == ["a-next"]


def test_catalog_lifecycle_random_ops_match_python_model(spark, tmp_path):
    """Model-based check of the CATALOG protocol: a seeded random
    sequence of member advances (some members, not others),
    generation commits, and generation expiries against a Python
    model (generation -> {member: rows}). After every op the current
    resolution AND a random surviving generation must equal the
    model exactly; expired generations raise; and member versions a
    surviving generation references are always readable — the
    no-torn-state and retention-safety invariants under interaction,
    not just in single-feature tests."""
    import random

    from hubsit_health_analytics_etl_spark.sources.versioned import (
        catalog_commit,
        catalog_current,
        catalog_expire,
        read_catalog,
        read_catalog_table,
    )

    rng = random.Random(23)
    cat = str(tmp_path / "cat")
    members = ["dump", "idx", "stats"]
    troot = {m: os.path.join(cat, "tables", m) for m in members}
    tv: dict[str, int] = {}  # member -> latest committed table version
    trows: dict[tuple[str, int], list] = {}  # (member, version) -> rows
    gens: dict[int, dict[str, int]] = {}  # generation -> member versions
    expired: set[int] = set()
    next_k = 0

    def advance(m):
        nonlocal next_k
        rows = [(next_k + i, f"{m}{next_k + i}") for i in range(rng.randint(1, 3))]
        next_k += len(rows)
        v = commit_version(_mk(spark, rows), troot[m])
        tv[m] = v
        trows[(m, v)] = sorted(rows)

    # generation 0 names every member
    for m in members:
        advance(m)
    catalog_commit(cat, dict(tv), expected_parent=None)
    gens[0] = dict(tv)

    for step in range(12):
        op = rng.choice(["advance_some", "advance_some", "commit", "expire"])
        cur = max(g for g in gens if g not in expired)
        if op == "advance_some":
            for m in rng.sample(members, rng.randint(1, len(members))):
                advance(m)
        elif op == "commit":
            g = catalog_commit(cat, dict(tv), expected_parent=cur)
            gens[g] = dict(tv)
        else:
            live = sorted(set(gens) - expired)
            keep = rng.randint(1, len(live))
            out = catalog_expire(cat, keep_last=keep)
            expired.update(out.get("_catalog", []))

        live = sorted(set(gens) - expired)
        assert catalog_current(cat) == live[-1]
        # every member of the current AND one random surviving
        # generation reads back exactly the modeled rows
        for g in {live[-1], rng.choice(live)}:
            named = read_catalog(cat, g)["tables"]
            assert {m: t["version"] for m, t in named.items()} == gens[g]
            for m, v in gens[g].items():
                got = sorted(
                    (r.k, r.v)
                    for r in read_catalog_table(spark, cat, m, n=g).collect()
                )
                assert got == trows[(m, v)], f"step {step} gen {g} {m}"
        if expired:
            with pytest.raises(FileNotFoundError):
                read_catalog(cat, sorted(expired)[0])


def test_catalog_gc_orphans_crash_sweep_never_leaves_torn_manifest(
    spark, tmp_path, monkeypatch
):
    """Exhaustive crash-point sweep of catalog_gc_orphans' destruction
    sequence (ADVICE r16 medium). The sweep's ORDER — pointer reset,
    then doomed manifests newest-first, then data files, then dirs —
    is the crash-safety argument: killing the sweep after ANY prefix
    of its destructive filesystem ops must leave (a) every surviving
    above-pointer manifest with ALL of its listed files on disk (so a
    replayed sink delivery can never adopt torn state), and (b) a
    state from which re-running the sweep converges to exactly the
    clean-run end state (self-healing). The OLD order (files before
    manifests) fails (a): a crash between the two loops strands an
    adoptable manifest whose files are gone — silent torn reads."""
    import shutil

    import hubsit_health_analytics_etl_spark.sources.versioned as v

    def build(root):
        troot = os.path.join(root, "tables", "docs")
        v0 = commit_version(_mk(spark, [(1, "a"), (2, "b")]), troot)
        v.catalog_commit(
            root,
            {"docs": (os.path.join("tables", "docs"), v0)},
            expected_parent=None,
        )
        # a crashed delivery's orphans above the catalog reference:
        # two appends (manifest chains reference parent files) + the
        # pointer sitting on the orphan top
        v.commit_version(
            _mk(spark, [(3, "c")]), troot, mode="append",
            extra={"batch_id": 1},
        )
        v.commit_version(
            _mk(spark, [(4, "d")]), troot, mode="append",
            extra={"batch_id": 2},
        )

    def snapshot(root):
        """Shape of the tree, token-normalized: data dirs are named
        v{n}_{random token} and parquet parts carry uuids, so compare
        (normalized dir, file kind) COUNTS plus pointer contents."""
        import re

        cnt: dict = {}
        ptrs: dict = {}
        for dirpath, _, files in os.walk(root):
            rel = re.sub(
                r"(v\d+)_[0-9a-f]+",
                r"\1",
                os.path.relpath(dirpath, root),
            )
            for f in files:
                if f.endswith(".tmp"):
                    # a crash at the pointer swap strands its token-
                    # named staging file — invisible to every reader
                    # (only the atomic os.replace publishes it)
                    continue
                if f in (v._POINTER, v._CAT_POINTER):
                    ptrs[os.path.join(rel, f)] = open(
                        os.path.join(dirpath, f)
                    ).read()
                    continue
                kind = (
                    "parquet"
                    if f.endswith(".parquet")
                    else "crc" if f.endswith(".crc") else f
                )
                key = (rel, kind)
                cnt[key] = cnt.get(key, 0) + 1
        return (sorted(cnt.items()), sorted(ptrs.items()))

    def destructive_counter(limit):
        """Wrap the three destructive primitives; raise at call #limit
        (1-indexed); limit=None counts only."""
        state = {"n": 0}
        real = (os.remove, os.replace, shutil.rmtree)

        def wrap(fn):
            def inner(*a, **kw):
                state["n"] += 1
                if limit is not None and state["n"] == limit:
                    raise RuntimeError("injected gc crash")
                return fn(*a, **kw)

            return inner

        return state, wrap(real[0]), wrap(real[1]), wrap(real[2])

    def torn_manifests(root):
        """Above-pointer manifests with any listed file missing."""
        torn = []
        troot = os.path.join(root, "tables", "docs")
        cur = current_version(troot)
        for n in list_versions(troot):
            if cur is not None and n <= cur:
                continue
            m = read_manifest(troot, n)
            if any(
                not os.path.exists(_abs_file(troot, f))
                for f in m["files"]
            ):
                torn.append(n)
        return torn

    # clean run: count destructive ops + record the converged state
    clean = str(tmp_path / "clean")
    build(clean)
    state, rm, rp, rt = destructive_counter(None)
    monkeypatch.setattr(os, "remove", rm)
    monkeypatch.setattr(os, "replace", rp)
    monkeypatch.setattr(shutil, "rmtree", rt)
    assert v.catalog_gc_orphans(clean, orphan_grace_s=0.0) == {
        "docs": [1, 2]
    }
    monkeypatch.undo()
    n_ops = state["n"]
    assert n_ops >= 4  # pointer + 2 manifests + >=1 data file
    want = snapshot(clean)

    for k in range(1, n_ops + 1):
        root = str(tmp_path / f"crash_{k}")
        build(root)
        _, rm, rp, rt = destructive_counter(k)
        monkeypatch.setattr(os, "remove", rm)
        monkeypatch.setattr(os, "replace", rp)
        monkeypatch.setattr(shutil, "rmtree", rt)
        try:
            v.catalog_gc_orphans(root, orphan_grace_s=0.0)
            raised = False
        except RuntimeError:
            raised = True
        finally:
            monkeypatch.undo()
        assert raised, f"crash point {k} did not fire"
        # (a) no adoptable torn manifest at any crash point
        assert torn_manifests(root) == [], f"crash point {k}"
        # (b) re-running the sweep converges to the clean end state
        v.catalog_gc_orphans(root, orphan_grace_s=0.0)
        assert snapshot(root) == want, f"crash point {k}"
        # and the table still reads its referenced version cleanly
        assert sorted(
            (r.k, r.v)
            for r in v.read_catalog_table(spark, root, "docs").collect()
        ) == [(1, "a"), (2, "b")]
