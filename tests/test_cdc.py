"""Snapshot-diff (CDC) semantics + plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_snapshot_diff_classifies_all_change_types(spark):
    from hubsit_health_analytics_etl_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (5, "e", 50.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged (absent), 2 updated, 3 deleted, 4 null-equal (absent), 5 inserted
    assert out == {2: "update", 3: "delete", 5: "insert"}


def test_snapshot_diff_null_vs_empty_and_boundary_shift(spark):
    """The fingerprint must not collide null with '' nor ('ab','c')
    with ('a','bc') — the two classic concat-fingerprint bugs."""
    from hubsit_health_analytics_etl_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, "ab", "c")], "k long, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "", "x"), (2, "a", "bc")], "k long, a string, b string"
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "update", 2: "update"}


def test_snapshot_diff_plan_is_equi_full_outer_with_narrow_shuffle(spark):
    """Plan contract at scale: a plain equi FullOuter (no cartesian /
    nested loop), and the md5 fingerprint projected BELOW the join so
    the shuffle carries (key, fp) — never the compared value columns."""
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    df = QUERIES["orders_snapshot_diff"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the compared columns are consumed by the map-side fingerprint:
    # no exchange row carries o_totalprice/o_orderstatus
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "o_totalprice" not in m.group(1)
        assert "o_orderstatus" not in m.group(1)


def test_merge_upsert_source_null_overwrites_and_actions(spark):
    """WHEN MATCHED must take the WHOLE source row: a legitimately-NULL
    source value overwrites the target's non-null value (the mistake a
    COALESCE(source, target) merge makes silently). All four actions
    typed correctly, including null-vs-null as unchanged."""
    from hubsit_health_analytics_etl_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    source = spark.createDataFrame(
        [(1, None, 10.0), (3, None, 30.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    out = {
        r["k"]: (r["s"], r["v"], r["merge_action"])
        for r in merge_upsert(target, source, ["k"]).collect()
    }
    assert out[1] == (None, 10.0, "update")  # source NULL overwrites 'a'
    assert out[2] == ("b", 20.0, "kept")
    assert out[3] == (None, 30.0, "unchanged")  # null == null
    assert out[4] == ("d", 40.0, "kept")
    assert out[5] == ("e", 50.0, "insert")
    assert len(out) == 5
