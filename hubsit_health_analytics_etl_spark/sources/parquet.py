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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes events.ts to timestamp_ntz
    truncated to microseconds exactly like DuckDB's ns→us cast.

    events.parquet stores TIMESTAMP(NANOS). Spark ≤4.0 under
    ``nanosAsLong`` surfaces it as ``bigint`` ns (converted here);
    Spark 4.1+ ignores that conf and reads ``timestamp_ntz`` natively
    (already µs-truncated), so the guard is a no-op there — both paths
    yield identical values."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
