"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over hubsit_health_analytics_etl_spark.workload: every
operator from SURVEY.md §2 is a named query there with a DuckDB oracle
twin. ``entry`` runs the flagship daily-status aggregation (A1+F10,
/root/reference/src/etl_pipeline.py:474-487) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# resolvable regardless of the driver's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    return QUERIES["daily_status"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column aliases). Queries with
    no entry here are non-SQL-expressible → rows-only check."""
    from hubsit_health_analytics_etl_spark.workload import ORACLES

    return dict(ORACLES)
