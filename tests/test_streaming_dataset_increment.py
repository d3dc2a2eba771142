"""streaming/dataset_increment.py — the stream-equals-rebuild law for
the WHOLE dataset-build flagship: a document readStream maintained
through the foreachBatch splice sink must leave a final training dump
identical to the from-scratch `w10::_llm_dataset_plan` over the full
corpus, with every generation published as ONE atomic catalog commit
(dump + corpus + all 19 standing indexes flip together)."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from .conftest import SF_SMOKE


def _dump_rows(df):
    return sorted(
        (
            r["doc_id"],
            r["shard"],
            r["shard_pos"],
            r["bin"],
            r["n_tokens_kept"],
            r["n_bpe_tokens"],
        )
        for r in df.collect()
    )


@pytest.mark.slow
def test_streamed_dataset_increment_equals_from_scratch_build(
    spark, tmp_path
):
    """sf0.001 documents sliced into 3 chronological files and
    streamed one file per trigger: after the replay, the catalog's
    ``dump`` member equals the flagship from-scratch plan over the
    whole corpus row-for-row; the catalog advanced once per
    micro-batch; and a re-delivered final batch is a no-op (replay
    idempotence by batch id)."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        catalog_current,
        read_catalog,
        read_catalog_table,
    )
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    from hubsit_health_analytics_etl_spark.workloads.w10_dataset_build import (
        _llm_dataset_plan,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_docs = docs.count()
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[n_docs // 3], ids[2 * n_docs // 3]]
    slices = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter(
            (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
        ),
        docs.filter(F.col("doc_id") >= cuts[1]),
    ]
    ordered = str(tmp_path / "ordered")
    os.makedirs(ordered)
    for i, s in enumerate(slices):
        d = str(tmp_path / f"slice_{i}")
        s.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(part) == 1
        dst = f"{ordered}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part[0]}", dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    cat_root = str(tmp_path / "cat")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(ordered)
    )
    q = (
        stream.writeStream.foreachBatch(llm_dataset_stream_sink(cat_root))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert q.exception() is None

    # one catalog generation per micro-batch, members advanced together
    assert catalog_current(cat_root) == 2
    members = read_catalog(cat_root)["tables"]
    assert set(members) >= {
        "docs",
        "dump",
        "ann",
        "labels",
        "mh_edges",
        "decon_hits",
        "scrub_postings",
        "rwf",
    }
    # the corpus member accumulated every streamed doc (append commits)
    got_docs = read_catalog_table(spark, cat_root, "docs")
    assert got_docs.count() == n_docs

    # THE LAW: streamed dump ≡ from-scratch flagship plan, row-for-row
    got = _dump_rows(read_catalog_table(spark, cat_root, "dump"))
    want = _dump_rows(_llm_dataset_plan(spark, SF_SMOKE))
    assert got == want
    assert len(got) > 0

    # replay idempotence: re-delivering the final batch (same batch_id,
    # same data — foreachBatch's at-least-once contract) is a no-op
    last_id = read_catalog(cat_root)["extra"]["batch_id"]
    llm_dataset_stream_sink(cat_root)(slices[2], last_id)
    assert catalog_current(cat_root) == 2

    # every intermediate generation remains time-travelable and names
    # a consistent (docs, dump) pair: generation 0's corpus is slice 0
    g0_docs = read_catalog_table(
        spark,
        cat_root,
        "docs",
        n=0,
    )
    assert g0_docs.count() == slices[0].count()


def _three_slices(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    return docs, [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter(
            (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
        ),
        docs.filter(F.col("doc_id") >= cuts[1]),
    ]


@pytest.mark.slow
def test_sink_crash_between_member_and_catalog_commits_recovers(
    spark, tmp_path, monkeypatch
):
    """Fault injection on the atomic-publish boundary: the sink
    commits member-table versions first and the catalog LAST, so a
    crash after the member commits but before the catalog swap must
    leave readers on the previous generation (no torn state), and the
    at-least-once re-delivery must converge to exactly the state a
    crash-free run produces — in particular the append-mode ``docs``
    corpus must NOT re-append the batch onto the orphaned pre-crash
    append (ADVICE r15 high: the replay adopts the orphan by batch
    id), and a FURTHER batch after recovery must still satisfy the
    stream-equals-rebuild law."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    from hubsit_health_analytics_etl_spark.workloads.w10_dataset_build import (
        _llm_dataset_plan,
    )

    docs, (a, b, c) = _three_slices(spark)

    cat_root = str(tmp_path / "cat")
    sink = llm_dataset_stream_sink(cat_root)
    sink(a, 0)  # bootstrap generation
    assert v.catalog_current(cat_root) == 0

    # deliver batch B but crash at the catalog publish — every member
    # commit (including the docs APPEND) has already landed
    real_commit = v.catalog_commit

    def crash(*args, **kw):
        raise RuntimeError("injected crash before catalog swap")

    monkeypatch.setattr(v, "catalog_commit", crash)
    try:
        sink(b, 1)
    except RuntimeError:
        pass
    monkeypatch.setattr(v, "catalog_commit", real_commit)

    # readers still resolve the pre-crash generation, fully consistent
    assert v.catalog_current(cat_root) == 0
    assert v.read_catalog_table(spark, cat_root, "docs").count() == a.count()
    # the orphaned docs append exists above the pinned version
    docs_root = f"{cat_root}/tables/docs"
    assert v.current_version(docs_root) == 1

    # at-least-once re-delivery converges: generation 1 publishes, the
    # docs corpus holds a ∪ b EXACTLY ONCE (the orphan was adopted,
    # not appended onto), and the dump equals the from-scratch plan
    sink(b, 1)
    assert v.catalog_current(cat_root) == 1
    got_docs = v.read_catalog_table(spark, cat_root, "docs")
    assert got_docs.count() == a.count() + b.count()
    assert v.read_catalog(cat_root)["tables"]["docs"]["version"] == 1

    # a third batch after recovery: the standing state the splice sees
    # is uncorrupted, so the final dump equals the from-scratch
    # flagship plan over the whole corpus
    sink(c, 2)
    assert v.catalog_current(cat_root) == 2
    got_docs = v.read_catalog_table(spark, cat_root, "docs")
    assert got_docs.count() == docs.count()
    assert (
        got_docs.select("doc_id").distinct().count() == docs.count()
    )
    got = _dump_rows(v.read_catalog_table(spark, cat_root, "dump"))
    want = _dump_rows(_llm_dataset_plan(spark, SF_SMOKE))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_sink_kill_and_restart_from_checkpoint_converges(
    spark, tmp_path, monkeypatch
):
    """Kill-and-restart through the REAL checkpoint machinery (VERDICT
    r15 #5): a streaming query is terminated mid-batch (injected crash
    at the catalog publish of batch 1, after its member commits), then
    a NEW query restarts from the same checkpoint. Structured
    Streaming re-delivers batch 1 under the same batch id; the sink
    must adopt the orphaned docs append and the catalog must end at
    exactly the generation chain of an uninterrupted run (exactly-once
    via batch-id + CAS)."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    from hubsit_health_analytics_etl_spark.workloads.w10_dataset_build import (
        _llm_dataset_plan,
    )

    docs, slices = _three_slices(spark)
    ordered = str(tmp_path / "ordered")
    os.makedirs(ordered)
    for i, s in enumerate(slices):
        d = str(tmp_path / f"slice_{i}")
        s.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")]
        dst = f"{ordered}/{i:03d}.parquet"
        shutil.copy(f"{d}/{part[0]}", dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    cat_root = str(tmp_path / "cat")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(ordered)
            .writeStream.foreachBatch(llm_dataset_stream_sink(cat_root))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    real_commit = v.catalog_commit

    def crash_on_batch_1(cat, tables, **kw):
        if (kw.get("extra") or {}).get("batch_id") == 1:
            raise RuntimeError("injected kill before catalog swap")
        return real_commit(cat, tables, **kw)

    monkeypatch.setattr(v, "catalog_commit", crash_on_batch_1)
    q = start()
    try:
        q.awaitTermination(600)
    except Exception:
        pass  # awaitTermination re-raises the query's failure
    assert q.exception() is not None  # the query died mid-batch
    # torn-state check: batch 0 published, batch 1's members orphaned
    assert v.catalog_current(cat_root) == 0
    assert v.current_version(f"{cat_root}/tables/docs") == 1

    monkeypatch.setattr(v, "catalog_commit", real_commit)
    q2 = start()  # restart from the same checkpoint
    q2.awaitTermination(600)
    assert q2.exception() is None

    # same generation chain as an uninterrupted run: 3 generations,
    # batch ids 0/1/2, corpus exactly-once, dump == from-scratch plan
    assert v.catalog_current(cat_root) == 2
    assert [
        v.read_catalog(cat_root, n)["extra"]["batch_id"] for n in range(3)
    ] == [0, 1, 2]
    got_docs = v.read_catalog_table(spark, cat_root, "docs")
    assert got_docs.count() == docs.count()
    assert got_docs.select("doc_id").distinct().count() == docs.count()
    got = _dump_rows(v.read_catalog_table(spark, cat_root, "dump"))
    want = _dump_rows(_llm_dataset_plan(spark, SF_SMOKE))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_sink_refuses_foreign_docs_orphan(spark, tmp_path):
    """The replay-adoption path is gated on proof of identity: a docs
    version above the catalog-pinned one whose manifest does NOT carry
    this delivery's batch id (a foreign writer appended to the member
    table directly) must make the sink refuse loudly rather than adopt
    or append onto foreign state."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    import pytest as _pytest

    _, (a, b, c) = _three_slices(spark)
    cat_root = str(tmp_path / "cat")
    sink = llm_dataset_stream_sink(cat_root)
    sink(a, 0)

    # a foreign writer appends directly to the member table
    v.commit_version(
        b, f"{cat_root}/tables/docs", mode="append", extra={"who": "foreign"}
    )
    with _pytest.raises(v.ConcurrentWriteError):
        sink(c, 1)
    # nothing was published over the foreign state
    assert v.catalog_current(cat_root) == 0


@pytest.mark.slow
def test_catalog_gc_orphans_reclaims_crashed_delivery(
    spark, tmp_path, monkeypatch
):
    """catalog_gc_orphans (ADVICE r15 low): a crashed delivery leaves
    ~20 committed-but-unreferenced member versions; the opt-in sweep
    removes every member version above the newest catalog-referenced
    one — age-gated (default grace keeps them; grace 0 reclaims) —
    resets the member pointers, and a subsequent delivery appends
    cleanly onto the swept state."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    from hubsit_health_analytics_etl_spark.workloads.w10_dataset_build import (
        _llm_dataset_plan,
    )

    docs, (a, b, c) = _three_slices(spark)
    cat_root = str(tmp_path / "cat")
    sink = llm_dataset_stream_sink(cat_root)
    sink(a, 0)
    sink(b, 1)

    real_commit = v.catalog_commit
    monkeypatch.setattr(
        v,
        "catalog_commit",
        lambda *ar, **kw: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    try:
        sink(c, 2)
    except RuntimeError:
        pass
    monkeypatch.setattr(v, "catalog_commit", real_commit)

    docs_root = f"{cat_root}/tables/docs"
    assert v.current_version(docs_root) == 2  # orphaned append
    # age gate: fresh orphans (an in-flight delivery / adoption target)
    # survive the sweep under the default grace
    assert v.catalog_gc_orphans(cat_root) == {}
    assert v.current_version(docs_root) == 2

    swept = v.catalog_gc_orphans(cat_root, orphan_grace_s=0.0)
    assert swept.get("docs") == [2]
    assert len(swept) > 5  # the other standing members were swept too
    assert v.current_version(docs_root) == 1
    # every surviving generation still reads consistently
    assert v.read_catalog_table(spark, cat_root, "docs").count() == (
        a.count() + b.count()
    )
    assert v.read_catalog_table(spark, cat_root, "docs", n=0).count() == (
        a.count()
    )

    # the re-delivery after the sweep appends cleanly (no orphan to
    # adopt any more — the batch is simply re-run) and converges
    sink(c, 2)
    assert v.catalog_current(cat_root) == 2
    got_docs = v.read_catalog_table(spark, cat_root, "docs")
    assert got_docs.count() == docs.count()
    got = _dump_rows(v.read_catalog_table(spark, cat_root, "dump"))
    want = _dump_rows(_llm_dataset_plan(spark, SF_SMOKE))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_sink_refuses_when_another_writer_advances_the_catalog(
    spark, tmp_path, monkeypatch
):
    """The sink derives its splice at the generation it read on entry
    and publishes with expected_parent=that generation — a writer that
    lands a catalog commit DURING the splice must make the sink's
    publish fail loudly (ConcurrentWriteError), never silently
    overwrite the winner (the single-catalog-writer contract)."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    a = docs.filter(F.col("doc_id") < cut)
    b = docs.filter(F.col("doc_id") >= cut)

    cat_root = str(tmp_path / "cat")
    sink = llm_dataset_stream_sink(cat_root)
    sink(a, 0)
    assert v.catalog_current(cat_root) == 0

    real_commit = v.catalog_commit
    raced = {"done": False}

    def racing(cat, tables, **kw):
        if not raced["done"]:
            raced["done"] = True
            # a second writer publishes generation 1 first (it names
            # the same member versions — any commit moves the pointer)
            g0 = v.read_catalog(cat_root, 0)["tables"]
            real_commit(
                cat_root,
                {k: (t["root"], t["version"]) for k, t in g0.items()},
                expected_parent=0,
            )
        return real_commit(cat, tables, **kw)

    monkeypatch.setattr(v, "catalog_commit", racing)
    import pytest as _pytest

    with _pytest.raises(v.ConcurrentWriteError):
        sink(b, 1)
    # the winner's generation stands; nothing was silently replaced
    assert v.catalog_current(cat_root) == 1
    assert v.read_catalog(cat_root)["tables"]["docs"]["version"] == 0


def _catalog_footprint(cat_root):
    """Per-member on-disk file counts {(member, kind): n} — the
    disk-boundedness statistic (file NAMES carry uuid tokens and
    parquet bytes carry timestamps, so counts are the deterministic
    comparable)."""
    out: dict = {}
    for dirpath, _, files in os.walk(cat_root):
        rel = os.path.relpath(dirpath, cat_root)
        parts = rel.split(os.sep)
        key = "/".join(parts[:2]) if parts[0] == "tables" else "_catalog"
        for f in files:
            kind = (
                "parquet"
                if f.endswith(".parquet")
                else "manifest" if f.endswith(".json") else "other"
            )
            out[(key, kind)] = out.get((key, kind), 0) + 1
    return out


@pytest.mark.slow
def test_gc_hook_bounds_crashed_replay_disk_to_clean_baseline(
    spark, tmp_path, monkeypatch
):
    """Steady-state disk boundedness (VERDICT r16 #6): with the
    sink's opt-in sweeps on (gc_every_n_batches=1 orphan GC +
    keep_last_generations=1 retention), a stream that CRASHES at a
    catalog publish and is then replayed ends with exactly the
    on-disk footprint of an uninterrupted run — the crashed
    delivery's member versions (above-reference orphans that the
    replay's re-commits turn into mid-chain garbage) are fully
    reclaimed, and the final dump still equals the from-scratch
    flagship plan."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    from hubsit_health_analytics_etl_spark.workloads.w10_dataset_build import (
        _llm_dataset_plan,
    )

    docs, (a, b, c) = _three_slices(spark)
    policy = dict(
        gc_every_n_batches=1,
        gc_orphan_grace_s=0.0,
        keep_last_generations=1,
    )

    clean_root = str(tmp_path / "clean")
    sink = llm_dataset_stream_sink(clean_root, **policy)
    sink(a, 0)
    sink(b, 1)
    sink(c, 2)
    baseline = _catalog_footprint(clean_root)

    crash_root = str(tmp_path / "crashed")
    sink2 = llm_dataset_stream_sink(crash_root, **policy)
    sink2(a, 0)
    real_commit = v.catalog_commit

    def crash_on_batch_1(cat, tables, **kw):
        if (kw.get("extra") or {}).get("batch_id") == 1:
            raise RuntimeError("injected kill before catalog swap")
        return real_commit(cat, tables, **kw)

    monkeypatch.setattr(v, "catalog_commit", crash_on_batch_1)
    try:
        sink2(b, 1)
    except RuntimeError:
        pass
    monkeypatch.setattr(v, "catalog_commit", real_commit)
    # the crashed delivery left orphaned member versions on disk
    assert _catalog_footprint(crash_root) != baseline
    sink2(b, 1)  # replay: adopts the docs orphan, re-commits members
    sink2(c, 2)

    assert v.catalog_current(crash_root) == 2
    assert _catalog_footprint(crash_root) == baseline
    got = _dump_rows(v.read_catalog_table(spark, crash_root, "dump"))
    want = _dump_rows(_llm_dataset_plan(spark, SF_SMOKE))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_sink_refuses_to_adopt_orphan_with_missing_files(
    spark, tmp_path, monkeypatch
):
    """Adoption gate #3 (ADVICE r16 medium): an orphan docs version
    that matches this delivery by (parent, batch_id) but has LOST a
    data file (the torn state a crashed pre-r17 gc sweep could leave)
    must be refused loudly — publishing it into a catalog generation
    would be silent torn reads at every consumer."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )

    _, (a, b, _c) = _three_slices(spark)
    cat_root = str(tmp_path / "cat")
    sink = llm_dataset_stream_sink(cat_root)
    sink(a, 0)

    # crash batch 1 at the catalog publish: docs orphan v1 remains
    real_commit = v.catalog_commit
    monkeypatch.setattr(
        v,
        "catalog_commit",
        lambda *ar, **kw: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    try:
        sink(b, 1)
    except RuntimeError:
        pass
    monkeypatch.setattr(v, "catalog_commit", real_commit)

    docs_root = f"{cat_root}/tables/docs"
    assert v.current_version(docs_root) == 1
    # tear the orphan: remove one data file its manifest lists while
    # the manifest (and the batch_id adoption proof) stay intact
    own = [
        f
        for f in v.read_manifest(docs_root, 1)["files"]
        if f not in set(v.read_manifest(docs_root, 0)["files"])
    ]
    assert own, "append version lists no files of its own"
    os.remove(v._abs_file(docs_root, own[0]))

    with pytest.raises(v.ConcurrentWriteError, match="missing"):
        sink(b, 1)
    # nothing was published over the torn state
    assert v.catalog_current(cat_root) == 0
