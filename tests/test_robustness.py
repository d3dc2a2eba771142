"""Robustness: corrupt CSV rows land in the audit column; watermark
drops late data in streaming mode."""

from __future__ import annotations

import time

import pyspark.sql.functions as F


def test_corrupt_rows_survive_in_audit_column(spark, tmp_path):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from hubsit_health_analytics_etl_spark.sources.csv_tolerant import read_csv_tolerant

    p = tmp_path / "messy.csv"
    p.write_text(
        "id;name;qty\n1;ok;10\nnot_an_int;bad;xx\n2;fine;20\n", encoding="utf-8"
    )
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("qty", IntegerType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_csv_tolerant(spark, str(p), schema=schema)
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "not_an_int" in bad[0]["_corrupt_record"]


def test_watermark_drops_late_events(spark, tmp_path):
    """Feed a batch of on-time events, advance the watermark, then a
    very late event — the late row must NOT update its (closed)
    window in append mode."""
    from hubsit_health_analytics_etl_spark.streaming.windows import tumbling_agg

    src = tmp_path / "stream_src"
    src.mkdir()
    schema = "user_id long, ts timestamp, value double"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_b"))
        import glob as g
        import shutil

        part = g.glob(str(tmp_path / "tmp_b" / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    write_batch("b1", [(1, t0, 1.0), (1, t0 + dt.timedelta(minutes=30), 1.0)])
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = tumbling_agg(
        stream,
        "ts",
        "1 hour",
        aggs=[F.count(F.lit(1)).alias("n")],
        watermark="15 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far ahead → closes the first window
        write_batch("b2", [(1, t0 + dt.timedelta(hours=3), 1.0)])
        q.processAllAvailable()
        # a VERY late event for the long-closed first window
        write_batch("b3", [(1, t0 + dt.timedelta(minutes=1), 99.0)])
        q.processAllAvailable()
        write_batch("b4", [(1, t0 + dt.timedelta(hours=5), 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["window_start"]: r["n"] for r in spark.sql("SELECT * FROM late_smoke").collect()}
    # first window emitted with its 2 on-time events; the late 99.0
    # event neither re-emitted nor bumped the count
    assert rows.get("2024-01-01 00:00:00") == 2


def test_jsonl_roundtrip_and_corrupt_record_audit(spark, tmp_path):
    """JSONL tolerant ingest: well-formed lines parse, malformed lines
    survive as audit rows (never silently dropped), and clean+audit
    partition the input exactly."""
    import json as _json

    from hubsit_health_analytics_etl_spark.sources.jsonl import (
        read_jsonl,
        split_audit,
        write_jsonl,
    )

    src = tmp_path / "docs.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "hello world"}),
        '{"doc_id": 2, "text": "unterminated',        # malformed
        _json.dumps({"doc_id": 3, "text": "ok", "extra": 9}),
        "not json at all",                             # malformed
    ]
    src.write_text("\n".join(lines) + "\n")

    df = read_jsonl(spark, str(src), schema="doc_id bigint, text string")
    clean, audit = split_audit(df)
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "hello world", 3: "ok"}
    audit_rows = audit.collect()  # full-row collect is allowed on raw scans
    assert {r._corrupt_record for r in audit_rows} == {
        '{"doc_id": 2, "text": "unterminated', "not json at all"
    }
    assert all(r.doc_id is None and r.text is None for r in audit_rows)
    # every line accounted for: parsed + audited == input. A bare
    # audit.count() on the RAW scan is the one consumption Spark
    # disallows (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
    # cache-then-aggregate pattern works:
    cached = df.cache()
    try:
        c_clean, c_audit = split_audit(cached)
        assert c_clean.count() + c_audit.count() == 4
    finally:
        cached.unpersist()

    # round-trip: write clean back out and re-read identically
    out = tmp_path / "out"
    write_jsonl(clean, str(out))
    back = read_jsonl(spark, str(out), schema="doc_id bigint, text string")
    back_clean, back_audit = split_audit(back)
    assert {r.doc_id: r.text for r in back_clean.collect()} == got
    assert len(back_audit.collect()) == 0


def test_xml_tolerant_audits_malformed_elements_and_roundtrips(spark, tmp_path):
    """The XML ingest edge honors the shared tolerant-ingest contract:
    well-formed row elements parse, a malformed element lands in the
    _corrupt_record audit (never dropped, never fatal), split_audit
    separates clean/quarantine from ONE scan, the ingest report counts
    both, and write_xml→read round-trips the clean rows."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.sources.jsonl import split_audit
    from hubsit_health_analytics_etl_spark.sources.xml_tolerant import (
        read_xml_tolerant,
        write_xml,
        xml_ingest_report,
    )

    src = tmp_path / "feed.xml"
    src.write_text(
        "<consultas>"
        "<c><id>1</id><paciente>ana</paciente><valor>10.5</valor></c>"
        "<c><id>2</id><paciente>bruno</paciente><valor>20.0</valor></c>"
        "<c><id>oops</id><paciente>caio</paciente><valor>not_a_number</valor></c>"
        "</consultas>"
    )
    df = read_xml_tolerant(
        spark, str(src), row_tag="c",
        schema="id bigint, paciente string, valor double",
    ).cache()
    clean, audit = split_audit(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    bad = audit.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]
    rep = xml_ingest_report(df).collect()[0]
    assert (rep.n_rows, rep.n_clean, rep.n_corrupt) == (3, 2, 1)

    out = tmp_path / "out"
    write_xml(clean, str(out), row_tag="c", root_tag="consultas")
    back = read_xml_tolerant(
        spark, str(out), row_tag="c",
        schema="id bigint, paciente string, valor double",
    )
    assert sorted((r.id, r.paciente, r.valor) for r in split_audit(back)[0].collect()) \
        == [(1, "ana", 10.5), (2, "bruno", 20.0)]
    df.unpersist()


def test_xml_inference_read_of_clean_feed_keeps_audit_contract(spark, tmp_path):
    """schema=None inference on a CLEAN feed: Spark's XML inference
    omits _corrupt_record when the sampled file has no malformed
    elements, so the reader must add the (all-null) audit column
    itself — otherwise xml_ingest_report / split_audit fail with
    UNRESOLVED_COLUMN on exactly the healthy-feed path. Regression
    pin for that edge."""
    from hubsit_health_analytics_etl_spark.sources.jsonl import split_audit
    from hubsit_health_analytics_etl_spark.sources.xml_tolerant import (
        read_xml_tolerant,
        xml_ingest_report,
    )

    src = tmp_path / "clean.xml"
    src.write_text(
        "<consultas>"
        "<c><id>1</id><paciente>ana</paciente></c>"
        "<c><id>2</id><paciente>bruno</paciente></c>"
        "</consultas>"
    )
    df = read_xml_tolerant(spark, str(src), row_tag="c").cache()
    assert "_corrupt_record" in df.columns
    clean, audit = split_audit(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    assert audit.count() == 0
    rep = xml_ingest_report(df).collect()[0]
    assert (rep.n_rows, rep.n_clean, rep.n_corrupt) == (2, 2, 0)
    df.unpersist()
