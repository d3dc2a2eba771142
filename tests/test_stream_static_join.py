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
