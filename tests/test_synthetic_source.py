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


def test_synthetic_vocab_option_scale_invariant_rates(spark):
    """The scale-stress knob (bench_scale.py): vocab=N draws from an
    N-word lexicon with a ~10% exact-clone rate that is a pure
    function of doc_id — so a 10x corpus is the SAME distribution,
    only bigger. Pin: executor rows == driver function under vocab,
    clone rate stays ~10% at two sizes, and the legacy default is
    untouched."""
    from hubsit_health_analytics_etl_spark.sources.synthetic import synth_row

    df = (
        spark.read.format("synthetic_docs")
        .option("rows", "400")
        .option("vocab", "4000")
        .load()
    )
    got = {r["doc_id"]: tuple(r) for r in df.collect()}
    assert len(got) == 400
    for doc_id in (0, 13, 399):
        assert got[doc_id] == synth_row(doc_id, vocab=4000)

    def clone_rate(n):
        texts = [synth_row(i, vocab=4000)[1] for i in range(n)]
        return 1 - len(set(texts)) / len(texts)

    r1, r2 = clone_rate(1000), clone_rate(4000)
    assert 0.06 <= r1 <= 0.14 and 0.06 <= r2 <= 0.14, (r1, r2)
    # legacy default (no vocab option) unchanged
    assert synth_row(7) == synth_row(7, vocab=0)
