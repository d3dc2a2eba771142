"""sources/export.py — hash-sharded training dump + integrity
manifest: a clean dump verifies empty, every tamper class (lost
shard file, injected rows, altered values) is detected."""

from __future__ import annotations

import glob
import os

from .conftest import SF_SMOKE


def test_export_verify_and_tamper_detection(spark, tmp_path):
    from hubsit_health_analytics_etl_spark.sources.export import (
        export_training_shards,
        verify_export,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "dump")
    manifest = export_training_shards(docs, path, n_shards=4, key="doc_id")
    assert len(manifest["shards"]) == 4
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == docs.count()

    # honest dump verifies clean, and re-verification is stable
    assert verify_export(spark, path) == []
    assert verify_export(spark, path) == []

    # tamper 1: drop one shard's data file -> row-count mismatch
    victim = sorted(glob.glob(f"{path}/_shard=0/*.parquet"))[0]
    saved = str(tmp_path / "stashed.parquet")  # OUT of the dump tree
    os.rename(victim, saved)
    problems = verify_export(spark, path)
    assert any("shard 0" in p for p in problems), problems
    os.rename(saved, victim)
    assert verify_export(spark, path) == []

    # tamper 2: inject rows into a shard -> detected on that shard only
    extra = docs.limit(3).selectExpr(
        "doc_id + 1000000 as doc_id", "text", "lang", "source", "n_chars"
    )
    extra.withColumn("_shard", extra.doc_id * 0 + 1).write.mode(
        "append"
    ).partitionBy("_shard").parquet(path)
    problems = verify_export(spark, path)
    assert any(p.startswith("shard 1:") for p in problems), problems
    assert not any(p.startswith("shard 2:") for p in problems)


def test_empty_export_roundtrips_under_manifest_schema(spark, tmp_path):
    """bench_scale.py r13 finding: a filter chain that selects NOTHING
    still exports (zero data files) and must read back as an empty
    frame with the right columns + verify clean — not die on schema
    inference."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.sources.export import (
        export_training_shards,
        read_export,
        verify_export,
    )

    df = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"
    ).filter(F.col("doc_id") < 0)
    path = str(tmp_path / "empty_dump")
    m = export_training_shards(df, path, 4, "doc_id")
    assert m["shards"] == {}
    assert verify_export(spark, path) == []
    back = read_export(spark, path)
    assert back.columns == ["doc_id", "text", "_shard"]
    assert back.count() == 0
