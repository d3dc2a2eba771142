"""Parquet fixture loaders (TESTDATA.md tables).

Parquet is the engine's native storage (column pruning + predicate
pushdown + partition pruning for free); CSV only at the ingest/export
edges (see csv_tolerant.py / sinks.py), mirroring but upgrading the
reference's CSV-everywhere model (/root/reference/src/etl_pipeline.py:85-161).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Plan memo for IMMUTABLE parquet paths, keyed by (applicationId,
# path): every spark.read.parquet() call launches a ~100 ms 1-task
# schema-inference job even for a path the session already read —
# across 236 bench queries × 1-4 load_table calls each (plus the
# standing-index re-reads in the lifecycle queries) that is tens of
# seconds of pure driver-side footer jobs. Reusing the LOGICAL PLAN is
# not result caching: no .cache()/persist is involved, every action
# still scans the parquet files — only the redundant footer/schema
# re-inference is skipped. Valid ONLY for immutable paths (the
# read-only /root/testdata fixtures; versioned-table data dirs, which
# are write-once per version by construction) because the plan pins
# the file listing captured at first read.
_PLAN_MEMO: dict[tuple[str, str], DataFrame] = {}


def read_parquet_immutable(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the plan memoized per
    (session, path). Callers must only pass paths whose file set can
    never change (fixture tables, committed version data dirs)."""
    key = (spark.sparkContext.applicationId, path)
    got = _PLAN_MEMO.get(key)
    if got is None:
        if len(_PLAN_MEMO) > 4096:  # stale-session backstop
            _PLAN_MEMO.clear()
        got = _PLAN_MEMO.setdefault(key, spark.read.parquet(path))
    return got


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes events.ts to timestamp_ntz
    truncated to microseconds exactly like DuckDB's ns→us cast.

    events.parquet stores TIMESTAMP(NANOS). Spark ≤4.0 under
    ``nanosAsLong`` surfaces it as ``bigint`` ns (converted here);
    Spark 4.1+ ignores that conf and reads ``timestamp_ntz`` natively
    (already µs-truncated), so the guard is a no-op there — both paths
    yield identical values."""
    apply_runtime_confs(spark)
    df = read_parquet_immutable(spark, f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
