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


def test_sink_crash_between_member_and_catalog_commits_recovers(
    spark, tmp_path, monkeypatch
):
    """Fault injection on the atomic-publish boundary: the sink
    commits member-table versions first and the catalog LAST, so a
    crash after the member commits but before the catalog swap must
    leave readers on the previous generation (no torn state), and the
    at-least-once re-delivery must converge to exactly the state a
    crash-free run produces."""
    import hubsit_health_analytics_etl_spark.sources.versioned as v
    from hubsit_health_analytics_etl_spark.streaming.dataset_increment import (
        llm_dataset_stream_sink,
    )
    from hubsit_health_analytics_etl_spark.workloads.w10_dataset_build import (
        _llm_dataset_plan,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    a = docs.filter(F.col("doc_id") < cut)
    b = docs.filter(F.col("doc_id") >= cut)

    cat_root = str(tmp_path / "cat")
    sink = llm_dataset_stream_sink(cat_root)
    sink(a, 0)  # bootstrap generation
    assert v.catalog_current(cat_root) == 0

    # deliver batch B but crash at the catalog publish
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

    # at-least-once re-delivery converges: generation 1 publishes and
    # the dump equals the from-scratch flagship plan over a ∪ b
    sink(b, 1)
    assert v.catalog_current(cat_root) == 1
    got = _dump_rows(v.read_catalog_table(spark, cat_root, "dump"))
    want = _dump_rows(_llm_dataset_plan(spark, SF_SMOKE))
    assert got == want and len(got) > 0


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
