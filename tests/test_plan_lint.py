"""plans/lint.py — the pre-flight scale linter must flag each banned
pattern on a crafted plan and stay quiet on the shipped queries (whose
shapes test_plan_quality.py pins individually)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from .conftest import SF_SMOKE


def _lint(df):
    from hubsit_health_analytics_etl_spark.plans.lint import lint_plan

    return lint_plan(df)


def _codes(df):
    return [f.code for f in _lint(df)]


def test_lint_flags_cartesian_product(spark):
    big = spark.range(10_000_000).withColumnRenamed("id", "x")
    big2 = spark.range(10_000_000).withColumnRenamed("id", "y")
    found = _lint(big.crossJoin(big2))
    assert "cartesian-product" in [f.code for f in found]
    assert found[0].severity == "error"  # errors sort first


def test_lint_flags_row_at_a_time_python_udf(spark):
    a = spark.range(1000).withColumnRenamed("id", "x")
    udf = F.udf(lambda v: v + 1, "long")
    assert "row-python-udf" in _codes(a.select(udf("x")))


def test_lint_flags_single_partition_window(spark):
    a = spark.range(1000).withColumnRenamed("id", "x")
    w = Window.orderBy("x")
    assert "single-partition-stage" in _codes(
        a.withColumn("r", F.row_number().over(w))
    )


def test_lint_downgrades_broadcast_cross_to_info(spark):
    """Cross BuildRight against a broadcastable side is the sanctioned
    scalar/centroid shape — info, never an error."""
    a = spark.range(100_000).withColumnRenamed("id", "x")
    tiny = spark.range(5).withColumnRenamed("id", "y")
    found = _lint(a.crossJoin(tiny))
    codes = {f.code: f.severity for f in found}
    assert codes.get("broadcast-cross-join") == "info"
    assert "cartesian-product" not in codes


def test_lint_quiet_on_shipped_queries(spark):
    """No error/warn findings on representative shipped queries —
    their plans are the contracts test_plan_quality.py asserts."""
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    for name in [
        "daily_status",
        "top_customers",
        "revenue_by_region_nation",
        "minhash_lsh_pairs",
        "scd2_priority_history",
        "session_transcripts",
    ]:
        bad = [
            f
            for f in _lint(QUERIES[name](spark, SF_SMOKE))
            if f.severity in ("error", "warn")
        ]
        assert not bad, (name, bad)
