"""Stream-static enrichment: a streaming fact joined to a static
broadcast dimension — the streaming analogue of the engine's lookup
joins (no state, per-batch broadcast)."""

from __future__ import annotations

import pyspark.sql.functions as F

from .conftest import SF_SMOKE, fix_event_ts


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = fix_event_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE)
    )
    # static dim: per-user segment derived from customer fixture
    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "left").groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["c_mktsegment"]: r["n"]
        for r in spark.sql("SELECT * FROM enrich_smoke").collect()
    }
    # batch twin must agree exactly
    batch = load_table(spark, SF_SMOKE, "events").join(
        F.broadcast(dim), "user_id", "left"
    ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    expected = {r["c_mktsegment"]: r["n"] for r in batch.collect()}
    assert got == expected and sum(got.values()) == 1000


def test_streaming_dsir_scoring_equals_batch(spark, tmp_path):
    """The DSIR frozen-index scorer runs unchanged on a STREAM of new
    documents (the ingest-time filtering deployment): hashed-bigram
    explode + groupBy + two static count joins under availableNow
    must equal the batch scorer doc-for-doc. The count tables are the
    static side — per-batch broadcastable, no stream state beyond the
    aggregation."""
    from hubsit_health_analytics_etl_spark.operators.textanalysis import (
        dsir_bucket_counts,
        dsir_score_against_counts,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    tgt = dsir_bucket_counts(
        corpus.filter(F.col("n_chars") >= 300), out_col="c_t"
    ).localCheckpoint()
    raw = dsir_bucket_counts(corpus, out_col="c_r").localCheckpoint()

    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    scored = dsir_score_against_counts(stream, tgt, raw).select(
        "doc_id", "n_bigrams", F.round("logw", 6).alias("logw")
    )
    # the scorer chains two aggregations ((doc,bucket) tf -> per-doc
    # fold); Spark's global-watermark heuristic flags chained stateful
    # ops even under an availableNow replay of a BOUNDED source, where
    # no late data can exist by construction — the documented config
    # is the escape hatch for exactly this case. Restored in finally.
    ck = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    prev = spark.conf.get(ck, "true")
    spark.conf.set(ck, "false")
    try:
        q = (
            scored.writeStream.format("memory")
            .queryName("dsir_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(ck, prev)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logw"])
        for r in spark.sql("SELECT * FROM dsir_stream").collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["logw"])
        for r in dsir_score_against_counts(batch, tgt, raw)
        .select("doc_id", "n_bigrams", F.round("logw", 6).alias("logw"))
        .collect()
    }
    assert got == want and len(got) > 10
