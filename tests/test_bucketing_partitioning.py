"""Physical-layout levers: bucketed co-located joins (no shuffle
exchange), date-partitioned writes with partition pruning, and the
Arrow collect edge (S8)."""

from __future__ import annotations

import pyspark.sql.functions as F

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle_exchange(spark, tmp_path):
    from hubsit_health_analytics_etl_spark.plans.explain import physical_plan
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.sources.sinks import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        lineitem = load_table(spark, SF_SMOKE, "lineitem")
        write_bucketed_table(
            orders.select(F.col("o_orderkey").alias("k"), "o_totalprice"), "b_orders", "k", 8
        )
        write_bucketed_table(
            lineitem.select(F.col("l_orderkey").alias("k"), "l_quantity"), "b_lineitem", "k", 8
        )
        j = spark.table("b_orders").join(spark.table("b_lineitem"), "k")
        p = physical_plan(j)
        # co-located: a sort-merge join with NO shuffle Exchange
        assert "SortMergeJoin" in p
        import re

        assert not re.search(r"\n\(\d+\) Exchange", p), p
        assert j.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from hubsit_health_analytics_etl_spark.plans.explain import physical_plan
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.sources.sinks import write_parquet

    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = str(tmp_path / "li_part")
    write_parquet(lineitem, out, partition_by=["ship_year"])
    back = spark.read.parquet(out).filter(F.col("ship_year") == 1997)
    p = physical_plan(back)
    assert "PartitionFilters" in p and "ship_year" in p.split("PartitionFilters")[1].splitlines()[0]
    n_all = spark.read.parquet(out).count()
    n_1997 = back.count()
    assert 0 < n_1997 < n_all


def test_arrow_collect_edge(spark):
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.sources.sinks import collect_pandas

    small = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pdf = collect_pandas(small)
    assert set(pdf.columns) == {"o_orderstatus", "n"} and len(pdf) == 3


def test_approx_aggregates_close_to_exact(spark):
    """Scale-path sketches: approx_count_distinct (HLL) and
    approx_percentile (t-digest) within tolerance of exact."""
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact_d"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_d"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
    ).collect()[0]
    assert abs(row.approx_d - row.exact_d) / row.exact_d < 0.05
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 < 0.02


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    """A 64-small-file directory compacts to the planned file count
    with identical content; an already-compact directory is left
    untouched (no needless rewrite)."""
    from hubsit_health_analytics_etl_spark.sources.compaction import (
        compact_parquet,
        parquet_file_stats,
        plan_compaction,
    )

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    n0, total = parquet_file_stats(path)
    assert n0 == 64
    target = max(1, total // 4)  # plan ~4 output files
    want = plan_compaction(total, target)
    before = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())

    n1 = compact_parquet(spark, path, target_file_bytes=target)
    assert n1 <= want + 1 and n1 < n0
    after = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    assert before == after
    # no-op branch: a tiny target plans MORE files than exist ->
    # already compact, returns without rewriting anything
    assert compact_parquet(spark, path, target_file_bytes=1) == n1
    assert not (tmp_path / "frag__compacting").exists()
    assert not (tmp_path / "frag__pre_compact").exists()


def test_hll_sketch_index_persists_and_merges(spark, tmp_path):
    """The HLL distinct-count index round-trips through parquet and
    merges across disjoint ingests: estimate(merge(sketch(90%),
    sketch(10%))) ≈ exact distinct of the full data (≤2% error at HLL
    default lgK), with the merge touching only sketch rows."""
    from hubsit_health_analytics_etl_spark.operators.aggregate import (
        hll_estimate,
        hll_sketch_index,
        merge_hll_indexes,
    )
    from hubsit_health_analytics_etl_spark.operators.sampling import hash_bucket
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    events = load_table(spark, SF_SMOKE, "events")
    is_new = hash_bucket("event_id") < 10
    corpus, batch = events.filter(~is_new), events.filter(is_new)

    idx_path = str(tmp_path / "hll_idx")
    hll_sketch_index(corpus, ["event_type"], "user_id").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)  # binary sketch survives parquet

    merged = merge_hll_indexes(idx, hll_sketch_index(batch, ["event_type"], "user_id"))
    got = {r["event_type"]: r["n_distinct"] for r in hll_estimate(merged).collect()}

    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.02 * n), (k, got[k], n)


def test_compaction_recovers_crashed_run_and_refuses_partition_root(
    spark, tmp_path
):
    """Crash-recovery + partition-safety contract of compact_parquet:
    stale __compacting output is discarded at entry, a stale
    __pre_compact backup with no live directory is restored (the
    between-renames crash window), a backup alongside a live directory
    is cleaned up, and a partitioned-table ROOT is refused instead of
    silently folding partition columns into data files."""
    import os
    import shutil

    import pytest as _pytest

    from hubsit_health_analytics_etl_spark.sources.compaction import (
        compact_parquet,
        parquet_file_stats,
    )

    path = f"{tmp_path}/t"
    spark.range(0, 1000).repartition(8).write.parquet(path)
    n_rows = spark.read.parquet(path).count()

    # crash between the two renames: backup exists, live dir gone
    os.rename(path, path + "__pre_compact")
    shutil.copytree(path + "__pre_compact", path + "__compacting")
    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert spark.read.parquet(path).count() == n_rows
    assert not os.path.exists(path + "__pre_compact")
    assert not os.path.exists(path + "__compacting")
    assert n == parquet_file_stats(path)[0]

    # crash after the swap but before backup cleanup: both dirs live
    shutil.copytree(path, path + "__pre_compact")
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert not os.path.exists(path + "__pre_compact")
    assert spark.read.parquet(path).count() == n_rows

    # partitioned-table root is refused, data untouched
    proot = f"{tmp_path}/part"
    spark.range(0, 100).selectExpr("id", "id % 3 AS p").write.partitionBy(
        "p"
    ).parquet(proot)
    before = parquet_file_stats(proot)
    with _pytest.raises(ValueError, match="partition"):
        compact_parquet(spark, proot, target_file_bytes=1)
    assert parquet_file_stats(proot) == before


def test_merge_upsert_compare_cols_subset_carries_all_columns(spark):
    """compare_cols narrows only the update-vs-unchanged typing; every
    non-key target column must still flow through the merge (the
    previous behavior silently projected the merged table down to
    keys + compare_cols, truncating the target)."""
    from hubsit_health_analytics_etl_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, status string, extra int"
    )
    source = spark.createDataFrame(
        [(1, "a", 99), (3, "c", 30)], "k int, status string, extra int"
    )
    out = {
        r.k: r
        for r in merge_upsert(target, source, ["k"], ["status"]).collect()
    }
    assert set(out[1].asDict()) == {"k", "status", "extra", "merge_action"}
    # matched row differing only OUTSIDE compare_cols: typed unchanged,
    # but the source value still wins (MERGE takes the whole row)
    assert out[1].merge_action == "unchanged" and out[1].extra == 99
    assert out[2].merge_action == "kept" and out[2].extra == 20
    assert out[3].merge_action == "insert" and out[3].extra == 30


def test_hll_forget_rebuild_partition_scoped(spark, tmp_path):
    """VERDICT r12 #3: HLL is non-invertible, so its forget contract
    is a partition-scoped rebuild. Pin all three properties: (a) the
    maintained index's per-key estimates equal a from-scratch rebuild
    of the kept stream exactly (register max-merge is lossless across
    the splice), (b) untouched partitions' sketch binaries pass
    through BYTE-IDENTICALLY (nothing outside the affected partitions
    is recomputed), and (c) a fully-deleted partition's stale sketch
    drops via the explicit affected-parts list."""
    from hubsit_health_analytics_etl_spark.operators.aggregate import (
        hll_estimate,
        hll_forget_rebuild,
        hll_sketch_index,
        merge_hll_indexes,
    )
    from hubsit_health_analytics_etl_spark.operators.sampling import hash_bucket
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        "event_type",
        "user_id",
        (F.col("event_id") % 4).alias("ingest_part"),
    )
    # forget: a hash slice of partitions 0/1, ALL of partition 2
    is_del = (
        F.col("ingest_part").isin(0, 1) & (hash_bucket("event_id", salt="f") < 30)
    ) | (F.col("ingest_part") == 2)
    kept = events.filter(~is_del)

    idx_path = str(tmp_path / "hll_part_idx")
    hll_sketch_index(
        events, ["ingest_part", "event_type"], "user_id"
    ).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    affected = spark.createDataFrame([(0,), (1,), (2,)], "ingest_part long")
    maintained = hll_forget_rebuild(
        idx,
        kept.filter(F.col("ingest_part").isin(0, 1, 2)),
        affected,
        "ingest_part",
        ["event_type"],
        "user_id",
    )

    # (c) the fully-deleted partition leaves no rows behind
    assert maintained.filter(F.col("ingest_part") == 2).count() == 0

    # (b) partition 3's sketch binaries are byte-identical to the index
    old3 = {
        r["event_type"]: bytes(r["hll"])
        for r in idx.filter(F.col("ingest_part") == 3).collect()
    }
    new3 = {
        r["event_type"]: bytes(r["hll"])
        for r in maintained.filter(F.col("ingest_part") == 3).collect()
    }
    assert old3 == new3 and old3

    # (a) maintained estimates == from-scratch rebuild of kept, exactly
    def _est(index):
        per_key = merge_hll_indexes(index.drop("ingest_part"))
        return {
            r["event_type"]: r["n_distinct"]
            for r in hll_estimate(per_key).collect()
        }

    fresh = hll_sketch_index(kept, ["ingest_part", "event_type"], "user_id")
    assert _est(maintained) == _est(fresh)
