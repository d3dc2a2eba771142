"""Schema evolution at the storage layer: mergeSchema reads across
parquet files written with different (compatible) schemas — the
append-a-column migration every long-lived 100 TB table goes through."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_merge_schema_read_across_file_generations(spark, tmp_path):
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.parquet(base + "/gen=1")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    )
    v2.write.parquet(base + "/gen=2")

    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "name", "score", "gen"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None  # old files null-fill the new column
    assert rows[3]["score"] == 9.5
    # and the engine's quality profile copes with the evolved schema
    from hubsit_health_analytics_etl_spark.operators.profile import quality_profile

    prof = {r["coluna"]: r for r in quality_profile(merged, ["score"]).collect()}
    assert prof["score"]["faltantes"] == 2


def test_versioned_table_schema_evolution_across_commits(spark, tmp_path):
    """The same migration through the manifest-pointer layout: an
    append commit ADDS a column; the manifest's by-name schema union
    makes the current version read old files with nulls for it
    (explicit-schema read, no footer merging), while time travel to
    the pre-migration version still yields the original schema."""
    from hubsit_health_analytics_etl_spark.sources.versioned import (
        commit_version,
        read_version,
    )

    root = str(tmp_path / "vtbl")
    commit_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"),
        root,
    )
    commit_version(
        spark.createDataFrame(
            [(3, "c", 9.5)], "id long, name string, score double"
        ),
        root,
        mode="append",
    )

    cur = read_version(spark, root)
    assert cur.columns == ["id", "name", "score"]
    rows = {r.id: r for r in cur.collect()}
    assert rows[1].score is None and rows[2].score is None
    assert rows[3].score == 9.5

    old = read_version(spark, root, 0)
    assert old.columns == ["id", "name"]
    assert sorted((r.id, r.name) for r in old.collect()) == [(1, "a"), (2, "b")]
