"""Streaming dedup (bounded state) and the foreachBatch upsert sink:

- fingerprint dedup drops cosmetic re-submissions on a stream and
  keeps the deterministic earliest arrival on batch input;
- a watermarked tumbling aggregation finalizes windows and DROPS late
  events that arrive in a later micro-batch (the late-data contract);
- the upsert sink maintains a latest-wins snapshot and is idempotent
  under micro-batch replay.

Multi-micro-batch sequencing uses the file source with
maxFilesPerTrigger=1 and forced modification times (oldest first), so
the watermark advances between batches deterministically.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _write_file(spark, rows, schema, directory, name, mtime):
    df = spark.createDataFrame(rows, schema)
    tmp = os.path.join(directory, "_stage_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dest = os.path.join(directory, name)
    os.rename(os.path.join(tmp, part), dest)
    os.utime(dest, (mtime, mtime))
    import shutil

    shutil.rmtree(tmp)
    return df.schema


TS = "cast('2025-01-01 {}' as timestamp)"


def _ts(hhmm):
    import datetime as dt

    h, m = hhmm.split(":")
    return dt.datetime(2025, 1, 1, int(h), int(m))


def test_streaming_fingerprint_dedup_matches_batch(spark, tmp_path):
    from hubsit_health_analytics_etl_spark.streaming.dedup import (
        streaming_dedup_by_fingerprint,
    )

    rows = [
        (1, "the quick brown fox", _ts("10:00")),
        (2, "  THE quick   brown fox ", _ts("10:01")),  # cosmetic dup of 1
        (3, "something else entirely", _ts("10:02")),
        (4, "the quick brown fox", _ts("10:03")),  # exact dup of 1
    ]
    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    _write_file(spark, rows, schema, src, "f1.parquet", 1_700_000_000)

    batch = spark.read.schema(schema).parquet(src)
    # batch path: deterministic earliest-ts winner per fingerprint
    b = streaming_dedup_by_fingerprint(batch, "text", "ts", "10 minutes")
    assert b.count() == 2

    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_dedup_by_fingerprint(stream, "text", "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream")
    assert got.count() == 2
    # input is IN-ORDER (arrival order == event-time order), so not
    # just the key set but the WINNING ROW must agree between paths —
    # with out-of-order input only the fp set is contractual (stream
    # keeps first arrival, batch keeps earliest event time; see
    # streaming/dedup.py docstring)
    assert {(r.fp, r.doc_id, r.ts) for r in got.collect()} == {
        (r.fp, r.doc_id, r.ts) for r in b.collect()
    }


def test_late_event_dropped_after_watermark_advance(spark, tmp_path):
    """Micro-batch 0 carries the 10:xx window plus a 12:30 event that
    advances the watermark to 12:20; two batches later a 10:30 event
    is re-delivered — now late — and must NOT change the finalized
    [10:00,11:00) count. (The buffer batch in between matters: Spark's
    operating watermark for batch N reflects data through batch N-2,
    so a late row one batch after the advancer still lands — verified
    behavior on this Spark build; the contract tested here is the
    steady-state one: once the watermark HAS advanced past a window,
    re-deliveries into it are dropped.)"""
    from hubsit_health_analytics_etl_spark.streaming.windows import tumbling_agg

    schema = "user_id long, value double, ts timestamp"
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    early = [(1, 1.0, _ts("10:05")), (2, 1.0, _ts("10:30")), (1, 1.0, _ts("12:30"))]
    buffer = [(2, 1.0, _ts("12:35"))]
    late = [(3, 99.0, _ts("10:30")), (2, 1.0, _ts("12:40"))]
    _write_file(spark, early, schema, src, "a_early.parquet", 1_700_000_000)
    _write_file(spark, buffer, schema, src, "b_buffer.parquet", 1_700_000_100)
    _write_file(spark, late, schema, src, "c_late.parquet", 1_700_000_200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = tumbling_agg(
        stream,
        "ts",
        "1 hour",
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
        watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.window_start: (r.n, r.total) for r in spark.table("late_drop").collect()}
    # the 10:00 window was finalized with ONLY the two early events —
    # the 99.0 late row was dropped by the watermark
    assert rows["2025-01-01 10:00:00"] == (2, 2.0)
    # the 12:00 window is still open (watermark 12:30 < 13:00) →
    # append mode has not emitted it
    assert "2025-01-01 12:00:00" not in rows


def test_upsert_sink_latest_wins_and_replay_idempotent(spark, tmp_path):
    from hubsit_health_analytics_etl_spark.streaming.sinks import (
        upsert_batch,
        upsert_sink,
    )

    schema = "k long, v string, ts timestamp"
    snap = str(tmp_path / "snapshot")

    b1 = spark.createDataFrame(
        [(1, "one-v1", _ts("10:00")), (2, "two-v1", _ts("10:00"))], schema
    )
    b2 = spark.createDataFrame(
        [(1, "one-v2", _ts("11:00")), (3, "three-v1", _ts("10:30"))], schema
    )
    upsert_batch(b1, snap, ["k"], "ts")
    upsert_batch(b2, snap, ["k"], "ts")
    got = {r.k: r.v for r in spark.read.parquet(snap).collect()}
    assert got == {1: "one-v2", 2: "two-v1", 3: "three-v1"}
    # replaying an old micro-batch (failure recovery) changes nothing
    upsert_batch(b1, snap, ["k"], "ts")
    again = {r.k: r.v for r in spark.read.parquet(snap).collect()}
    assert again == got

    # end-to-end: same data as a 2-micro-batch stream through foreachBatch
    src = str(tmp_path / "upsert_src")
    os.makedirs(src)
    _write_file(spark, [tuple(r) for r in b1.collect()], schema, src, "a.parquet", 1_700_000_000)
    _write_file(spark, [tuple(r) for r in b2.collect()], schema, src, "b.parquet", 1_700_000_100)
    snap2 = str(tmp_path / "snapshot_stream")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(upsert_sink(snap2, ["k"], "ts"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got2 = {r.k: r.v for r in spark.read.parquet(snap2).collect()}
    assert got2 == got


def test_upsert_recovers_from_crash_between_renames(spark, tmp_path):
    """A crash after `path -> ._old` but before `._tmp -> path` leaves
    only ._old; the next upsert must recover it, not rebuild the
    snapshot from one micro-batch."""
    from hubsit_health_analytics_etl_spark.streaming.sinks import upsert_batch

    schema = "k long, v string, ts timestamp"
    snap = str(tmp_path / "snap")
    upsert_batch(
        spark.createDataFrame([(1, "keep-me", _ts("10:00"))], schema), snap, ["k"], "ts"
    )
    os.rename(snap, snap + "._old")  # simulate the crash window
    upsert_batch(
        spark.createDataFrame([(2, "new", _ts("11:00"))], schema), snap, ["k"], "ts"
    )
    got = {r.k: r.v for r in spark.read.parquet(snap).collect()}
    assert got == {1: "keep-me", 2: "new"}
    assert not os.path.exists(snap + "._old")

    # stale ._old next to an intact snapshot is cleaned, not fatal
    os.makedirs(snap + "._old/junk")
    upsert_batch(
        spark.createDataFrame([(3, "three", _ts("12:00"))], schema), snap, ["k"], "ts"
    )
    assert spark.read.parquet(snap).count() == 3


def test_latest_wins_timestamp_tie_is_deterministic(spark):
    """Equal timestamps for one key: the winner is a pure function of
    the row data (whole-row hash), stable across repartitionings."""
    from hubsit_health_analytics_etl_spark.streaming.sinks import latest_wins

    rows = [(1, v, _ts("10:00")) for v in ("aa", "bb", "cc")]
    winners = set()
    for parts in (1, 3, 7):
        df = spark.createDataFrame(rows, "k long, v string, ts timestamp").repartition(
            parts
        )
        winners.add(latest_wins(df, ["k"], "ts").collect()[0].v)
    assert len(winners) == 1


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """availableNow stream-stream interval join == the batch join on
    the same input: clicks attributed to purchases by user within
    [0s, 30m] after the click."""
    from hubsit_health_analytics_etl_spark.streaming.joins import interval_join

    cs = "user_id long, click_id long, click_ts timestamp"
    ps = "user_id long, amount double, buy_ts timestamp"
    clicks = [
        (1, 10, _ts("10:00")), (1, 11, _ts("10:40")),
        (2, 20, _ts("10:05")), (3, 30, _ts("10:10")),
    ]
    buys = [
        (1, 5.0, _ts("10:20")),   # matches click 10 only (11 is later)
        (2, 7.0, _ts("10:50")),   # 45m after click 20 -> outside band
        (3, 9.0, _ts("10:10")),   # same instant: inclusive lower bound
    ]
    csrc, psrc = str(tmp_path / "c"), str(tmp_path / "p")
    os.makedirs(csrc), os.makedirs(psrc)
    _write_file(spark, clicks, cs, csrc, "c.parquet", 1_700_000_000)
    _write_file(spark, buys, ps, psrc, "p.parquet", 1_700_000_000)

    def run(left, right):
        j = interval_join(
            left, right, ["user_id"], "buy_ts", "click_ts",
            lower="0 seconds", upper="30 minutes",
        )
        return j.select("user_id", "click_id", "amount")

    batch = {
        (r.user_id, r.click_id, r.amount)
        for r in run(
            spark.read.schema(ps).parquet(psrc), spark.read.schema(cs).parquet(csrc)
        ).collect()
    }
    assert batch == {(1, 10, 5.0), (3, 30, 9.0)}

    out = run(
        spark.readStream.schema(ps).parquet(psrc),
        spark.readStream.schema(cs).parquet(csrc),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.click_id, r.amount) for r in spark.table("ssjoin").collect()
    }
    assert got == batch


def test_streaming_signature_index_accumulates_full_pair_set(spark, tmp_path):
    """Two ordered micro-batches through the signature-index sink: each
    batch is deduped against the index-so-far, then indexed. The union
    of emitted pairs must equal the full-corpus batch recompute (no
    cap, no pre-dedup) over everything that arrived — the streaming
    face of dedup_new_batch's incremental == full equivalence. Batch
    0's emissions may touch only batch-0 docs (nothing else is indexed
    yet)."""
    from hubsit_health_analytics_etl_spark.operators.dedup import minhash_candidates
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.incremental_dedup import (
        read_emitted_pairs,
        signature_index_sink,
    )

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    b1 = [(r.doc_id, r.text) for r in docs.filter(F.col("doc_id") < 100).collect()]
    b2 = [(r.doc_id, r.text) for r in docs.filter(F.col("doc_id") >= 100).collect()]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, b1, schema, src, "b1.parquet", 1_700_000_000)
    _write_file(spark, b2, schema, src, "b2.parquet", 1_700_000_100)

    index_dir, pairs_dir = str(tmp_path / "index"), str(tmp_path / "pairs")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(signature_index_sink(index_dir, pairs_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in read_emitted_pairs(spark, pairs_dir).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_candidates(
            docs, bucket_cap=None, pre_exact_dedup=False
        ).collect()
    }
    assert len(emitted) > 0
    assert emitted == full
    # batch 0 could only have seen batch-0 docs
    import glob as _glob

    batch0 = spark.read.parquet(str(tmp_path / "pairs" / "batch-0"))
    b1_ids = {d for d, _ in b1}
    assert all(
        r.doc_a in b1_ids and r.doc_b in b1_ids for r in batch0.collect()
    )
    # replay idempotence: re-running a batch rewrites, never duplicates
    sink = signature_index_sink(index_dir, pairs_dir)
    sink(spark.createDataFrame(b2, schema), 1)
    again = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in read_emitted_pairs(spark, pairs_dir).collect()
    }
    assert again == full


def test_interval_join_enforces_keys_on_shared_lineage(spark):
    """When both inputs derive from the SAME DataFrame, the key
    equality must still bind one side to each input — un-aliased,
    left[k] == right[k] resolves to a trivially-true self-comparison
    and the join silently degrades to the time band alone."""
    from hubsit_health_analytics_etl_spark.streaming.joins import interval_join

    base = spark.createDataFrame(
        [(1, _ts("10:00")), (2, _ts("10:05"))], "user_id long, ts timestamp"
    )
    left = base.select("user_id", F.col("ts").alias("l_ts"))
    right = base.select("user_id", F.col("ts").alias("r_ts"))
    j = interval_join(
        left, right, ["user_id"], "l_ts", "r_ts",
        lower="0 seconds", upper="30 minutes",
    )
    rows = {(r.user_id, r.l_ts, r.r_ts) for r in j.collect()}
    # user 2's row at 10:05 is within the band of user 1's 10:00 — it
    # must NOT join across users
    assert rows == {(1, _ts("10:00"), _ts("10:00")), (2, _ts("10:05"), _ts("10:05"))}


def test_streaming_ivf_sink_matches_batch_and_replays_idempotently(spark, tmp_path):
    """The streaming IVF sink's per-batch results must equal the batch
    ivf_search_index over exactly the earlier batches' vectors, batch 0
    must emit nothing (empty index), and replaying a batch must
    reproduce its original results even though its own postings are
    already in the index (batch_id < current filter)."""
    from hubsit_health_analytics_etl_spark.operators.similarity import (
        ivf_index,
        ivf_search_index,
        label_mean_centroids,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.incremental_ann import (
        ivf_index_sink,
        read_search_results,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 120
    )
    cents = label_mean_centroids(emb).select(
        F.col("label").alias("cell"), "centroid"
    )
    b1 = emb.filter(F.col("vec_id") < 80)
    b2 = emb.filter(F.col("vec_id") >= 80)

    schema = "vec_id long, embedding array<float>, label int"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, [tuple(r) for r in b1.collect()], schema, src,
                "b1.parquet", 1_700_000_000)
    _write_file(spark, [tuple(r) for r in b2.collect()], schema, src,
                "b2.parquet", 1_700_000_100)

    index_dir, results_dir = str(tmp_path / "index"), str(tmp_path / "results")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            ivf_index_sink(index_dir, results_dir, cents, k=5)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def rows(df):
        return {tuple(r) for r in df.collect()}

    # batch 0 searched an empty index
    batch0 = spark.read.parquet(os.path.join(results_dir, "batch-0"))
    assert batch0.count() == 0
    # batch 1's results == batch search of b2 against b1's index
    _, assigned_b1 = ivf_index(b1, centroids=cents)
    expected = ivf_search_index(assigned_b1, cents, b2, 5)
    got = spark.read.parquet(os.path.join(results_dir, "batch-1"))
    assert rows(got) == rows(expected) and got.count() > 0
    assert rows(read_search_results(spark, results_dir)) == rows(expected)

    # replay batch 1: its own postings are in the index now, but the
    # batch_id filter reproduces the original results exactly
    sink = ivf_index_sink(index_dir, results_dir, cents, k=5)
    sink(b2.select("vec_id", "embedding"), 1)
    again = spark.read.parquet(os.path.join(results_dir, "batch-1"))
    assert rows(again) == rows(expected)


def test_streaming_cluster_sink_matches_full_recompute(spark, tmp_path):
    """Two ordered micro-batches through the cluster-index sink: each
    batch's duplicate edges merge into the persisted label table; the
    latest-wins label resolution after both batches must equal the
    from-scratch connected-components clustering of everything that
    arrived — the streaming face of dedup_clusters_new_batch's
    incremental == full equivalence. Replaying a batch must not change
    the resolved labels (fixpoint + overwrite-own-subdirectory)."""
    from hubsit_health_analytics_etl_spark.operators.clusters import (
        connected_components,
    )
    from hubsit_health_analytics_etl_spark.operators.dedup import minhash_candidates
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.incremental_clusters import (
        cluster_index_sink,
        read_cluster_labels,
    )

    thr = 0.3
    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    b1 = [(r.doc_id, r.text) for r in docs.filter(F.col("doc_id") < 100).collect()]
    b2 = [(r.doc_id, r.text) for r in docs.filter(F.col("doc_id") >= 100).collect()]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, b1, schema, src, "b1.parquet", 1_700_000_000)
    _write_file(spark, b2, schema, src, "b2.parquet", 1_700_000_100)

    index_dir, labels_dir = str(tmp_path / "index"), str(tmp_path / "labels")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            cluster_index_sink(index_dir, labels_dir, thr)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.node, r.component)
        for r in read_cluster_labels(spark, labels_dir).collect()
    }
    edges = minhash_candidates(docs, bucket_cap=None, pre_exact_dedup=False).filter(
        F.col("jaccard") >= thr
    )
    comps = connected_components(edges)
    expected = {
        (r.node, r.component)
        for r in docs.select(F.col("doc_id").alias("node"))
        .join(comps, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
        .collect()
    }
    assert len(got) == 200
    assert got == expected
    assert any(n != c for n, c in got)  # the fixture does contain dup clusters
    # replay: re-running batch 1 leaves the resolved labels unchanged
    sink = cluster_index_sink(index_dir, labels_dir, thr)
    sink(spark.createDataFrame(b2, schema), 1)
    again = {
        (r.node, r.component)
        for r in read_cluster_labels(spark, labels_dir).collect()
    }
    assert again == expected


def test_streaming_cluster_sink_bucket_cap_observed(spark, tmp_path):
    """cluster_index_sink's opt-in bucket_cap bounds per-bucket probe
    work in a live feed (one hot template would otherwise emit O(m^2)
    pairs on one reducer every micro-batch): an over-cap band bucket
    contributes no edges — its newcomer stays a singleton — while
    small buckets still merge, and the drop is counted via Observation
    (never silent). Default bucket_cap=None keeps the exact
    incremental==full equivalence the previous test pins."""
    from pyspark.sql import Observation

    from hubsit_health_analytics_etl_spark.streaming.incremental_clusters import (
        cluster_index_sink,
        read_cluster_labels,
    )

    spam = "limited offer click here to claim your free prize today only"
    plain = "a perfectly ordinary and unique sentence nobody else wrote"
    index_dir, labels_dir = str(tmp_path / "index"), str(tmp_path / "labels")
    thr = 0.3
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(i, spam) for i in range(50)] + [(60, plain)], schema
    )
    cluster_index_sink(index_dir, labels_dir, thr)(b0, 0)  # uncapped bootstrap

    obs = Observation("cluster_cap")
    sink = cluster_index_sink(
        index_dir, labels_dir, thr, bucket_cap=8, observation=obs
    )
    sink(spark.createDataFrame([(1000, spam), (1001, plain)], schema), 1)

    labels = {
        r.node: r.component
        for r in read_cluster_labels(spark, labels_dir).collect()
    }
    assert labels[1001] == labels[60]  # 2-member bucket survives the cap
    assert labels[1000] == 1000  # 51-member spam bucket dropped: no merge
    assert obs.get["dropped_buckets"] >= 1
    assert obs.get["dropped_members"] >= 50


def test_fanout_sink_multi_target_and_replay_idempotent(spark, tmp_path):
    """One stream, two parquet sinks: both receive every row, and
    re-delivering the same batch (crash replay) rewrites its
    _batch_id partition instead of duplicating."""
    from hubsit_health_analytics_etl_spark.streaming.sinks import fanout_sink

    from .conftest import SF_SMOKE, fix_event_ts

    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    p1, p2 = str(tmp_path / "lake"), str(tmp_path / "serve")
    stream = fix_event_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE)
    ).select("event_id", "user_id", "value")
    sink = fanout_sink([p1, p2])
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    n_src = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    ids1 = sorted(r["event_id"] for r in spark.read.parquet(p1).collect())
    ids2 = sorted(r["event_id"] for r in spark.read.parquet(p2).collect())
    assert len(ids1) == n_src and ids1 == ids2

    # crash replay: re-deliver batch 0 by hand FROM THE SOURCE (a real
    # replay re-reads the input, never the sink) — partition
    # overwrite, not append, so counts are unchanged
    batch0 = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    sink(batch0, 0)
    assert spark.read.parquet(p1).count() == n_src
    assert spark.read.parquet(p2).count() == n_src


def test_versioned_upsert_sink_stream_batch_isolation_replay(spark, tmp_path):
    """The versioned streaming sink end-to-end:

    1. a 2-micro-batch availableNow stream produces the same
       latest-wins state as the plain upsert sink on the same data;
    2. every micro-batch became a version with its batch_id in the
       manifest (time travel to the mid-stream state works);
    3. a reader resolved BEFORE a later commit keeps its snapshot
       (the isolation the directory-swap sink cannot give);
    4. re-delivering the current batch (crash replay) is a no-op —
       no new version, same state."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        current_version,
        read_manifest,
        read_version,
    )
    from hubsit_health_analytics_etl_spark.streaming.sinks import (
        versioned_upsert_sink,
    )

    schema = "k long, v string, ts timestamp"
    b1 = spark.createDataFrame(
        [(1, "one-v1", _ts("10:00")), (2, "two-v1", _ts("10:00"))], schema
    )
    b2 = spark.createDataFrame(
        [(1, "one-v2", _ts("11:00")), (3, "three-v1", _ts("10:30"))], schema
    )
    final = {1: "one-v2", 2: "two-v1", 3: "three-v1"}

    # end-to-end through a real stream, one file per micro-batch
    src = str(tmp_path / "vsrc")
    os.makedirs(src)
    _write_file(spark, [tuple(r) for r in b1.collect()], schema, src,
                "a.parquet", 1_700_000_000)
    _write_file(spark, [tuple(r) for r in b2.collect()], schema, src,
                "b.parquet", 1_700_000_100)
    root = str(tmp_path / "vtbl")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(versioned_upsert_sink(root, ["k"], "ts"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert current_version(root) == 1  # one version per micro-batch
    assert read_manifest(root, 0)["extra"] == {"batch_id": 0}
    assert read_manifest(root, 1)["extra"] == {"batch_id": 1}
    got = {r.k: r.v for r in read_version(spark, root).collect()}
    assert got == final
    # time travel to the mid-stream state
    mid = {r.k: r.v for r in read_version(spark, root, 0).collect()}
    assert mid == {1: "one-v1", 2: "two-v1"}

    # snapshot isolation: a reader pinned before the next commit
    sink = versioned_upsert_sink(root, ["k"], "ts")
    pinned = read_version(spark, root)  # resolves v1's files now
    b3 = spark.createDataFrame([(2, "two-v2", _ts("12:00"))], schema)
    sink(b3, 2)
    assert current_version(root) == 2
    assert {r.k: r.v for r in pinned.collect()} == final  # unchanged

    # replay of the already-committed batch: no-op, no new version
    sink(b3, 2)
    assert current_version(root) == 2
    assert {r.k: r.v for r in read_version(spark, root).collect()} == {
        1: "one-v2",
        2: "two-v2",
        3: "three-v1",
    }


def test_partitioned_upsert_sink_touches_only_affected_buckets(spark, tmp_path):
    """The fact-state merge sink: state equals the full-snapshot
    upsert's latest-wins result, but a micro-batch rewrites ONLY the
    hash buckets its keys land in — untouched bucket files keep their
    exact bytes/mtimes. Replay of a delivered batch converges to the
    same state, and the bucket count is pinned for the table's life."""
    import glob

    import pytest

    from hubsit_health_analytics_etl_spark.streaming.sinks import (
        latest_wins,
        partitioned_upsert_sink,
    )

    schema = "k long, v string, ts timestamp"
    tbl = str(tmp_path / "fact")
    sink = partitioned_upsert_sink(tbl, ["k"], "ts", n_buckets=8)

    b1 = spark.createDataFrame(
        [(k, f"v1-{k}", _ts("10:00")) for k in range(40)], schema
    )
    sink(b1, 0)
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(tbl, "_bucket=*", "*.parquet"))
    }
    n_parts_before = len(glob.glob(os.path.join(tbl, "_bucket=*")))

    # batch 2 updates TWO keys -> touches at most two buckets
    b2 = spark.createDataFrame(
        [(3, "v2-3", _ts("11:00")), (7, "v2-7", _ts("11:00"))], schema
    )
    sink(b2, 1)

    got = {
        r.k: r.v for r in spark.read.parquet(tbl).collect()
    }
    expected = {
        r.k: r.v
        for r in latest_wins(b1.unionByName(b2), ["k"], "ts").collect()
    }
    assert got == expected and got[3] == "v2-3" and got[7] == "v2-7"

    # untouched buckets: identical files, untouched on disk
    from pyspark.sql import functions as F

    touched = {
        r._bucket
        for r in b2.select(
            F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("_bucket")
        ).collect()
    }
    untouched_survivors = 0
    for f, mt in files_before.items():
        bucket = int(f.split("_bucket=")[1].split("/")[0])
        if bucket not in touched:
            assert os.path.exists(f) and os.path.getmtime(f) == mt, f
            untouched_survivors += 1
    assert untouched_survivors > 0
    assert len(glob.glob(os.path.join(tbl, "_bucket=*"))) == n_parts_before

    # replay: same state, still only touched buckets rewritten
    sink(b2, 1)
    assert {r.k: r.v for r in spark.read.parquet(tbl).collect()} == expected

    # bucket count is immutable table layout
    with pytest.raises(ValueError, match="n_buckets"):
        partitioned_upsert_sink(tbl, ["k"], "ts", n_buckets=16)(b2, 2)


def test_merge_sinks_skip_empty_micro_batches(spark, tmp_path):
    """foreachBatch delivers empty batches on idle triggers: both merge
    sinks must no-op on them — an empty FIRST batch must not create a
    schema-less table (partitioned) or a zero-file manifest
    (versioned), and an empty batch between real ones changes
    nothing."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        current_version,
        read_version,
    )
    from hubsit_health_analytics_etl_spark.streaming.sinks import (
        partitioned_upsert_sink,
        versioned_upsert_sink,
    )

    schema = "k long, v string, ts timestamp"
    empty = spark.createDataFrame([], schema)
    b1 = spark.createDataFrame([(1, "one", _ts("10:00"))], schema)

    ptbl = str(tmp_path / "p")
    psink = partitioned_upsert_sink(ptbl, ["k"], "ts", n_buckets=4)
    psink(empty, 0)  # empty FIRST batch: nothing created
    assert not os.path.exists(os.path.join(ptbl, "_n_buckets"))
    psink(b1, 1)
    psink(empty, 2)  # empty mid-stream batch: state unchanged
    assert {r.k: r.v for r in spark.read.parquet(ptbl).collect()} == {1: "one"}

    vtbl = str(tmp_path / "v")
    vsink = versioned_upsert_sink(vtbl, ["k"], "ts")
    vsink(empty, 0)
    assert current_version(vtbl) is None  # no zero-file manifest
    vsink(b1, 1)
    vsink(empty, 2)
    assert current_version(vtbl) == 0
    assert {r.k: r.v for r in read_version(spark, vtbl).collect()} == {1: "one"}


def test_streaming_cms_grid_equals_batch_sketch_and_replays_clean(
    spark, tmp_path
):
    """Two ordered micro-batches through the count-min grid sink: the
    summed index must be CELL-IDENTICAL to sketching the full stream
    in one batch (grid additivity carried through the sink plumbing),
    and re-running a delivered batch must rewrite, never double-count.
    A probe through the live grid must therefore match the one-shot
    estimates exactly."""
    from hubsit_health_analytics_etl_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.sketches import (
        cms_grid_sink,
        read_cms_grid,
    )

    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id")
        .filter(F.col("event_id") < 400)
    )
    b1 = [
        (r.event_id, r.user_id)
        for r in events.filter(F.col("event_id") < 200).collect()
    ]
    b2 = [
        (r.event_id, r.user_id)
        for r in events.filter(F.col("event_id") >= 200).collect()
    ]
    schema = "event_id long, user_id long"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, b1, schema, src, "b1.parquet", 1_700_000_000)
    _write_file(spark, b2, schema, src, "b2.parquet", 1_700_000_100)

    index_dir = str(tmp_path / "cms_index")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(cms_grid_sink(index_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    live = read_cms_grid(spark, index_dir)
    got = {(r.row_i, r.bucket): r.c for r in live.collect()}
    want = {
        (r.row_i, r.bucket): r.c
        for r in cms_counters(events.select("user_id"), "user_id").collect()
    }
    assert got == want

    # probing the live grid == probing the one-shot sketch
    keys = events.select("user_id").distinct()
    est_live = {
        r.user_id: r.est_count
        for r in cms_estimate(keys, live, "user_id").collect()
    }
    est_batch = {
        r.user_id: r.est_count
        for r in cms_estimate(
            keys, cms_counters(events.select("user_id"), "user_id"), "user_id"
        ).collect()
    }
    assert est_live == est_batch

    # replay: re-delivering batch 1 rewrites its grid, never doubles it
    sink = cms_grid_sink(index_dir)
    sink(spark.createDataFrame(b2, schema), 1)
    again = {
        (r.row_i, r.bucket): r.c
        for r in read_cms_grid(spark, index_dir).collect()
    }
    assert again == want


def test_streaming_value_histogram_equals_batch_and_replays_clean(
    spark, tmp_path
):
    """The quantile-index sink: two ordered micro-batches summed must
    be BIN-IDENTICAL to histogramming the full stream at once, live
    percentiles through the summed index must equal the one-shot
    report, and re-delivering a batch must rewrite, never
    double-count."""
    from hubsit_health_analytics_etl_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.sketches import (
        read_value_histogram,
        value_histogram_sink,
    )

    lo, hi, bins = 0.0, 1000.0, 256
    pcts = [25, 50, 75, 99]
    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "value")
        .filter(F.col("event_id") < 400)
    )
    b1 = [
        (r.event_id, r.value)
        for r in events.filter(F.col("event_id") < 200).collect()
    ]
    b2 = [
        (r.event_id, r.value)
        for r in events.filter(F.col("event_id") >= 200).collect()
    ]
    schema = "event_id long, value double"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, b1, schema, src, "b1.parquet", 1_700_000_000)
    _write_file(spark, b2, schema, src, "b2.parquet", 1_700_000_100)

    index_dir = str(tmp_path / "qhist_index")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            value_histogram_sink(index_dir, "value", lo, hi, bins)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    live = read_value_histogram(spark, index_dir)
    want_hist = value_histogram(events, "value", lo, hi, bins)
    assert {(r.bin, r.cnt) for r in live.collect()} == {
        (r.bin, r.cnt) for r in want_hist.collect()
    }

    got_q = sorted(
        map(tuple, histogram_quantiles(live, pcts, lo, hi, bins).collect())
    )
    want_q = sorted(
        map(tuple, histogram_quantiles(want_hist, pcts, lo, hi, bins).collect())
    )
    assert got_q == want_q

    # replay: re-delivering batch 1 rewrites its histogram
    sink = value_histogram_sink(index_dir, "value", lo, hi, bins)
    sink(spark.createDataFrame(b2, schema), 1)
    again = {
        (r.bin, r.cnt)
        for r in read_value_histogram(spark, index_dir).collect()
    }
    assert again == {(r.bin, r.cnt) for r in want_hist.collect()}


def test_streaming_moments_equal_batch_and_power_the_ztest(spark, tmp_path):
    """The moments sink: summed per-key triples must equal a one-shot
    aggregate of the full stream, re-delivery must rewrite (not
    double-count), and the live index must reproduce the batch
    z-outlier counts exactly."""
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.sketches import (
        moments_sink,
        read_moments,
    )

    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "value")
        .filter(F.col("event_id") < 400)
    )
    b1 = [(r.event_id, r.user_id, r.value)
          for r in events.filter(F.col("event_id") < 200).collect()]
    b2 = [(r.event_id, r.user_id, r.value)
          for r in events.filter(F.col("event_id") >= 200).collect()]
    schema = "event_id long, user_id long, value double"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, b1, schema, src, "b1.parquet", 1_700_000_000)
    _write_file(spark, b2, schema, src, "b2.parquet", 1_700_000_100)

    index_dir = str(tmp_path / "moments")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(moments_sink(index_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    live = {r.key: (r.n, r.sx, r.sxx)
            for r in read_moments(spark, index_dir).collect()}
    want = {
        r.user_id: (r.n, r.sx, r.sxx)
        for r in events.select(
            "user_id",
            F.expr("cast(round(value * 100) as bigint)").alias("v"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sx"),
            F.sum(F.expr("v * v")).cast("bigint").alias("sxx"),
        )
        .collect()
    }
    assert live == want

    # replay idempotence
    moments_sink(index_dir)(spark.createDataFrame(b2, schema), 1)
    again = {r.key: (r.n, r.sx, r.sxx)
             for r in read_moments(spark, index_dir).collect()}
    assert again == want

    # the z-test through the live index == computed from raw history
    def outliers(stats):
        e = [(r.user_id, round(r.value * 100)) for r in events.collect()]
        out = {}
        for u, v in e:
            n, sx, sxx = stats[u]
            dev = v * n - sx
            out[u] = out.get(u, 0) + (
                1 if dev * dev > 9 * (n * sxx - sx * sx) else 0
            )
        return out

    assert outliers(live) == outliers(want)


def test_streaming_theta_sketch_equals_batch_and_replays_clean(spark, tmp_path):
    """The theta sink: rolled-up batch sketches must be ARRAY-IDENTICAL
    to a one-shot build over the full stream (the exact union-merge
    law live), estimates through the live index must match, and
    re-delivering a batch must rewrite, never distort the sample."""
    from hubsit_health_analytics_etl_spark.operators.theta import (
        theta_estimate,
        theta_sketch,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.streaming.sketches import (
        read_theta_sketch,
        theta_sketch_sink,
    )

    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "event_type", "user_id")
        .filter(F.col("event_id") < 400)
    )
    b1 = [(r.event_id, r.event_type, r.user_id)
          for r in events.filter(F.col("event_id") < 200).collect()]
    b2 = [(r.event_id, r.event_type, r.user_id)
          for r in events.filter(F.col("event_id") >= 200).collect()]
    schema = "event_id long, event_type string, user_id long"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, b1, schema, src, "b1.parquet", 1_700_000_000)
    _write_file(spark, b2, schema, src, "b2.parquet", 1_700_000_100)

    index_dir = str(tmp_path / "theta_index")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            theta_sketch_sink(index_dir, ["event_type"], "user_id")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    idx_schema = "event_type string, hs array<bigint>"
    live = read_theta_sketch(spark, index_dir, ["event_type"], idx_schema)
    want = theta_sketch(events, ["event_type"], "user_id", prefilter=False)
    got_arrays = {r.event_type: list(r.hs) for r in live.collect()}
    want_arrays = {r.event_type: list(r.hs) for r in want.collect()}
    assert got_arrays == want_arrays

    got_est = {r.event_type: r.est_distinct for r in theta_estimate(live).collect()}
    want_est = {r.event_type: r.est_distinct for r in theta_estimate(want).collect()}
    assert got_est == want_est

    # replay: re-delivering batch 1's data under its id rewrites
    sink = theta_sketch_sink(index_dir, ["event_type"], "user_id")
    sink(spark.createDataFrame(b2, schema), 1)
    again = {
        r.event_type: list(r.hs)
        for r in read_theta_sketch(spark, index_dir, ["event_type"], idx_schema).collect()
    }
    assert again == want_arrays
