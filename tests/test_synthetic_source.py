"""Spark 4 Python Data Source API — the synthetic_docs generator
source must produce the declared schema, the requested rows across
the requested partitions, and be bit-deterministic across reads
(retried tasks regenerate identical slices)."""

from __future__ import annotations


def test_synthetic_docs_source_end_to_end(spark):
    from hubsit_health_analytics_etl_spark.sources.synthetic import (
        register,
        synth_row,
    )

    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", "300")
        .option("partitions", "4")
        .load()
    )
    assert df.count() == 300
    assert df.rdd.getNumPartitions() == 4
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    # executor rows == driver-side pure function (determinism contract)
    got = {r["doc_id"]: tuple(r) for r in df.collect()}
    assert sorted(got) == list(range(300))
    for doc_id in (0, 7, 299):
        assert got[doc_id] == synth_row(doc_id)
    # n_chars is consistent with text
    assert all(v[4] == len(v[1]) for v in got.values())
    # second read is identical (stable under re-planning)
    df2 = spark.read.format("synthetic_docs").option("rows", "300").load()
    assert sorted(map(tuple, df2.collect())) == sorted(got.values())
