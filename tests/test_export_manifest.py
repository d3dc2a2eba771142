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


def test_manifest_observation_exact_under_task_retry(tmp_path):
    """VERDICT r17 #7: the manifest stats ride the write as Observation
    (accumulator-backed) metrics; a retried write-stage task must not
    double-count n_rows/content_fp. Needs task retries, which local[N]
    disables (task.maxFailures=1) — so this drill runs in a subprocess
    session with master local[4,2] and injects a first-attempt failure
    into a write-stage task, then asserts the manifest still equals
    verify_export's independent re-read."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repr(str(__import__('pathlib').Path(__file__).resolve().parent.parent))})
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4,2]")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "4")
                 .appName("retry-drill").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark import TaskContext
        from hubsit_health_analytics_etl_spark.sources.export import (
            export_training_shards, verify_export)

        def fail_once(batches):
            ctx = TaskContext.get()
            if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            for b in batches:
                yield b

        base = spark.range(0, 200).selectExpr(
            "id as doc_id", "id * 7 as payload")
        # repartition puts fail_once (and the observe projection above
        # it) INSIDE the write stage — the retried task is a write task
        flaky = base.repartition(4).mapInPandas(
            fail_once, "doc_id long, payload long")
        path = {repr(str(tmp_path / "retry_dump"))}
        manifest = export_training_shards(flaky, path, 3, "doc_id")
        problems = verify_export(spark, path)
        n_total = sum(s["n_rows"] for s in manifest["shards"].values())
        print("PROBLEMS:", problems)
        print("N_TOTAL:", n_total)
        assert problems == [], problems
        assert n_total == 200, n_total
        print("RETRY_DRILL_OK")
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "RETRY_DRILL_OK" in out.stdout, (
        out.stdout[-2000:] + "\n---\n" + out.stderr[-2000:]
    )
