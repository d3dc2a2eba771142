"""Structured-Streaming compatibility: the SAME window builders used
by the batch (oracle-checked) queries run under readStream with a
watermark and produce identical results on a bounded input."""

from __future__ import annotations

import pyspark.sql.functions as F

from .conftest import SF_SMOKE, fix_event_ts


def _events_stream(spark):
    # Watermarks require TIMESTAMP (LTZ): fix_event_ts converts either
    # the bigint-ns or timestamp_ntz representation on both sides.
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    batch = fix_event_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    # the dir contains all tables; restrict via pathGlobFilter
    stream = fix_event_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE)
    )
    return batch, stream


def test_tumbling_agg_streaming_matches_batch(spark):
    from hubsit_health_analytics_etl_spark.streaming.windows import tumbling_agg

    batch, stream = _events_stream(spark)
    aggs = lambda: [  # noqa: E731
        F.count(F.lit(1)).alias("n_eventos"),
        F.round(F.sum("value"), 2).alias("valor_total"),
    ]
    expected = sorted(
        tumbling_agg(batch, "ts", "1 hour", aggs(), keys=["event_type"]).collect()
    )

    out = tumbling_agg(
        stream, "ts", "1 hour", aggs(), keys=["event_type"], watermark="2 hours"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(spark.sql("SELECT * FROM tumbling_smoke").collect())
    assert got == expected


def test_watermark_operators_accept_ntz_event_time(spark, tmp_path):
    """Every watermarking operator must cast TIMESTAMP_NTZ event time
    to LTZ internally (streaming/eventtime.py): Spark 4.1 reads the
    nanos fixtures as NTZ, and a raw withWatermark rejects that type.
    Covers dedup, windows, and interval join on a purpose-built NTZ
    source (version-independent, unlike the fixture read dtype)."""
    from hubsit_health_analytics_etl_spark.streaming.dedup import (
        streaming_dedup_by_fingerprint,
    )
    from hubsit_health_analytics_etl_spark.streaming.joins import interval_join
    from hubsit_health_analytics_etl_spark.streaming.windows import tumbling_agg

    src = str(tmp_path / "src")
    spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), (F.col("id") % 2).cast("string")).alias("text"),
        F.expr(
            "cast(timestamp_micros(1735732800000000 + id * 60000000) as timestamp_ntz)"
        ).alias("ts"),
    ).write.mode("overwrite").parquet(src)
    assert dict(spark.read.parquet(src).dtypes)["ts"] == "timestamp_ntz"
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    # dedup: run end-to-end — 4 docs with 2 distinct normalized texts
    out = streaming_dedup_by_fingerprint(stream, "text", "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("ntz_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) FROM ntz_dedup").collect()[0][0] == 2

    # windows + interval join: watermark analysis is eager, so building
    # the plans on NTZ inputs is the acceptance check
    tumbling_agg(
        stream, "ts", "1 hour", [F.count(F.lit(1)).alias("n")], watermark="2 hours"
    )
    interval_join(
        stream.select("doc_id", F.col("ts").alias("l_ts")),
        stream.select(F.col("doc_id").alias("r_doc"), F.col("ts").alias("r_ts")),
        keys=[],
        left_ts="l_ts",
        right_ts="r_ts",
    )


def test_session_agg_is_streaming_plannable(spark):
    """session_window must be accepted by the streaming planner (update
    mode + watermark) — catches accidental batch-only constructs."""
    from hubsit_health_analytics_etl_spark.streaming.windows import session_agg

    _, stream = _events_stream(spark)
    out = session_agg(
        stream,
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_eventos")],
        watermark="1 hour",
    )
    # session-window streaming aggs support append/complete, not update
    q = (
        out.writeStream.format("memory")
        .queryName("session_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) FROM session_smoke").collect()[0][0] > 0


def test_query_health_and_state_pressure(spark, tmp_path):
    """monitor.query_health / state_pressure report the five on-call
    numbers from a real windowed aggregation run, and return all-None
    (never crash) before any progress exists."""
    from hubsit_health_analytics_etl_spark.streaming.monitor import (
        query_health,
        state_pressure,
    )
    from hubsit_health_analytics_etl_spark.streaming.windows import tumbling_agg

    from .conftest import SF_SMOKE, fix_event_ts

    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = fix_event_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE)
    )
    agg = tumbling_agg(
        stream, "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("n")], watermark="2 hours"
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    h, s = query_health(q), state_pressure(q)
    q.stop()
    assert h["batch_id"] is not None
    assert h["batch_duration_ms"] is not None and h["batch_duration_ms"] > 0
    assert s["n_state_operators"] >= 1
    assert s["state_rows"] is not None and s["state_rows"] >= 0

    # no-progress path: a fresh query object never crashes the monitor
    class _NoProgress:
        lastProgress = None

    assert query_health(_NoProgress())["batch_id"] is None
    assert state_pressure(_NoProgress())["n_state_operators"] == 0


def test_windowed_drift_histogram_streaming_matches_batch(spark):
    """The drift monitor's histogram stage (streaming/drift.py) runs
    under readStream with a watermark and produces the identical
    per-(window,bin) counts as the batch path, and psi_vs_reference
    over the streamed histogram reproduces the batch PSI scores —
    the continuous-deployment claim of windowed_drift_psi."""
    from hubsit_health_analytics_etl_spark.streaming.drift import (
        psi_vs_reference,
        windowed_value_histogram,
    )

    batch, stream = _events_stream(spark)
    kw = dict(
        ts="ts", duration="1 day", value_col="value",
        vmin=0.0, vmax=330.0, bins=8,
    )
    expected_hist = sorted(
        map(tuple, windowed_value_histogram(batch, **kw).collect())
    )
    out = windowed_value_histogram(stream, watermark="2 days", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName("drift_hist_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_hist_df = spark.sql("SELECT * FROM drift_hist_smoke")
    got_hist = sorted(map(tuple, got_hist_df.collect()))
    assert got_hist == expected_hist and len(got_hist) > 0

    reference = [10] * 8
    expected_psi = sorted(
        map(tuple, psi_vs_reference(
            windowed_value_histogram(batch, **kw), reference, bins=8
        ).collect())
    )
    got_psi = sorted(
        map(tuple, psi_vs_reference(got_hist_df, reference, bins=8).collect())
    )
    assert got_psi == expected_psi


def test_drift_monitor_soak_under_real_micro_batches(spark, tmp_path):
    """The on-call contract end-to-end (VERDICT r8 #6): the drift
    monitor's histogram stage runs as a REAL rate-limited readStream
    under processing-time triggers for >= 3 micro-batches, and across
    the whole soak the monitor's numbers stay bounded and sane —
    batch ids strictly increase, batch durations are positive and
    finite, the stateful operator's state_rows stays bounded by
    (windows x bins) rather than growing with input rows, and
    psi_vs_reference over the live histogram yields one finite PSI
    row per window. rate-source values are wall-clock-dependent, so
    every assertion is a BOUND, not a value pin (the value pins live
    in the batch==streaming equality tests above)."""
    import time

    from hubsit_health_analytics_etl_spark.streaming.drift import (
        psi_vs_reference,
        windowed_value_histogram,
    )
    from hubsit_health_analytics_etl_spark.streaming.monitor import (
        query_health,
        state_pressure,
    )

    B = 8
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            ((F.col("value") % 100) / 100.0).alias("value"),
        )
    )
    hist = windowed_value_histogram(
        stream, "ts", "10 seconds", "value", 0.0, 1.0, bins=B,
        watermark="30 seconds",
    )
    q = (
        hist.writeStream.format("memory")
        .queryName("drift_soak")
        .outputMode("complete")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            done = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
            if len(done) >= 3:
                break
            time.sleep(0.5)
        progress = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
        assert len(progress) >= 3, "soak never reached 3 data micro-batches"

        batch_ids = [p["batchId"] for p in progress]
        assert batch_ids == sorted(batch_ids) and len(set(batch_ids)) == len(
            batch_ids
        )
        for p in progress:
            dur = (p.get("durationMs") or {}).get("triggerExecution")
            assert dur is not None and 0 < dur < 60_000

        h, s = query_health(q), state_pressure(q)
        assert h["batch_id"] is not None and h["batch_duration_ms"] > 0
        assert h["input_rows_per_sec"] is not None
        assert s["n_state_operators"] >= 1
        # bounded state: the soak spans well under 20 ten-second
        # windows; state rows ~ windows x bins, never ~ input rows
        assert 0 < s["state_rows"] <= 20 * B

        reference = [100] * B
        psi = psi_vs_reference(
            spark.sql("SELECT * FROM drift_soak"), reference, bins=B
        ).collect()
        assert 0 < len(psi) <= 20  # one row per open window
        for r in psi:
            assert r.psi_u6 is not None and r.psi_u6 >= 0
            assert r.drifted in (0, 1)
    finally:
        q.stop()


def test_psi_vs_reference_accepts_merged_histograms(spark):
    """The module contract says per-(window,bin) counts 'merge across
    triggers, partitions and ingests' — so psi_vs_reference must accept
    a UNION of histogram batches, where the same (window, bin) key
    appears once per batch. Regression pin for the DUPLICATED_MAP_KEY
    crash (map_from_entries under mapKeyDedupPolicy=EXCEPTION): the
    PSI of two unioned half-corpus histograms must equal the PSI of
    the single full-corpus histogram."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.streaming.drift import (
        psi_vs_reference,
        windowed_value_histogram,
    )

    batch, _ = _events_stream(spark)
    kw = dict(
        ts="ts", duration="1 day", value_col="value",
        vmin=0.0, vmax=330.0, bins=8,
    )
    reference = [10] * 8
    whole = windowed_value_histogram(batch, **kw)
    # two ingests of the same window: split on a value parity so both
    # halves populate overlapping (window, bin) keys
    h1 = windowed_value_histogram(batch.filter(F.col("value") < 150), **kw)
    h2 = windowed_value_histogram(batch.filter(F.col("value") >= 150), **kw)
    merged = h1.unionByName(h2)
    # sanity: the union really does carry duplicate (window, bin) keys
    dup = (
        merged.groupBy("window_start", "bin").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup > 0, "fixture failed to produce overlapping histogram keys"
    expected = sorted(
        map(tuple, psi_vs_reference(whole, reference, bins=8).collect())
    )
    got = sorted(
        map(tuple, psi_vs_reference(merged, reference, bins=8).collect())
    )
    assert got == expected and len(got) > 0


def test_psi_vs_reference_matches_independent_python_replica(spark):
    """Shared-bug guard (the BPE lesson: an oracle that replays the
    same formula cannot catch a wrong formula): PSI scores from
    psi_vs_reference are re-derived independently in pure Python from
    the histogram rows — Laplace smoothing, closed-form empty bins,
    micro-unit floor — and must agree within 1 micro-unit (float fold
    association is the only legitimate difference)."""
    import math

    from hubsit_health_analytics_etl_spark.streaming.drift import (
        psi_vs_reference,
        windowed_value_histogram,
    )

    batch, _ = _events_stream(spark)
    B = 8
    reference = [5, 10, 20, 40, 20, 10, 5, 2]
    n_ref = sum(reference)
    hist = windowed_value_histogram(
        batch, ts="ts", duration="1 day", value_col="value",
        vmin=0.0, vmax=330.0, bins=B,
    )
    rows = hist.collect()
    got = {
        r.window_start: (r.n_cur, r.psi_u6, r.drifted)
        for r in psi_vs_reference(hist, reference, bins=B).collect()
    }
    by_win: dict = {}
    for r in rows:
        by_win.setdefault(r.window_start, {})[r.bin] = r.n
    assert set(got) == set(by_win)
    for win, bins in by_win.items():
        n_cur = sum(bins.values())
        psi = 0.0
        for b in range(B):
            c, rf = bins.get(b, 0), reference[b]
            pa = (c + 1) / (n_cur + B)
            pb = (rf + 1) / (n_ref + B)
            psi += (pa - pb) * math.log(((c + 1) * (n_ref + B)) / ((rf + 1) * (n_cur + B)))
        assert got[win][0] == n_cur
        assert abs(got[win][1] - math.floor(psi * 1e6)) <= 1, win
        assert got[win][2] == (1 if got[win][1] >= 200_000 else 0)
