"""Deterministic sampling / splitting for training-data pipelines.

``rand()``-based sampling changes row membership on every retry,
repartition, or speculative re-execution — poison for reproducible
training sets. Hash-based sampling decides membership from the ROW'S
OWN KEY (md5 → bucket in [0,100)), so it is stable across runs,
engines (same md5 trick as dedup.py — the DuckDB oracle reproduces it
exactly), partitions, and scales: a pure map-side filter, pushdown-
friendly, no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def hash_bucket(col: str, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from md5 of the key (+salt);
    ``col`` is a column NAME (the expression is built as SQL text so it
    stays byte-identical to the DuckDB twin). Engine-portable:
    Spark conv(substr(md5,1,8),16,10) == DuckDB
    CAST('0x'||substr(md5,1,8) AS BIGINT)."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{salt}', cast({col} as string))), 1, 8), 16, 10) "
        f"as bigint) % {n_buckets}"
    )


def sql_hash_bucket(col: str, n_buckets: int = 100, salt: str = "") -> str:
    """DuckDB twin of hash_bucket."""
    return (
        f"(CAST('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 8) AS BIGINT)"
        f" % {n_buckets})"
    )


def hash_sample(df: DataFrame, key: str, pct: int, salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket < pct (a stable pct% sample)."""
    return df.filter(hash_bucket(key, 100, salt) < pct)


def train_test_split(
    df: DataFrame, key: str, test_pct: int = 10, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible split on the key hash —
    membership never changes when the pipeline reruns or the data
    is re-partitioned."""
    b = hash_bucket(key, 100, salt)
    return df.filter(b >= test_pct), df.filter(b < test_pct)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (sampleBy) — for quota sampling
    where exact reproducibility matters less than stratum balance."""
    return df.sampleBy(strata_col, fractions, seed)
