"""Data-quality profiling — SURVEY.md §2.5 A8.

The reference profiles 12 hand-listed columns with a Python loop of
full-table scans (/root/reference/src/etl_pipeline.py:316-362,598-625).
Generalized: ONE aggregate pass over any schema computes
(null-or-sentinel count, filled count) for every column
simultaneously, then a stack() unpivot turns the single wide row into
the long (coluna, ...) quality table. One scan at 100 TB, not
len(cols) scans.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def quality_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    sentinel: str = "Indefinido",
    scale: int = 2,
) -> DataFrame:
    """Per-column completeness → long table
    (coluna, total, faltantes, preenchidos, pct_faltante, pct_preenchido).

    'Missing' = null, or equal to ``sentinel``, or (string) empty after
    trim — the reference's `isna() | isin(['Indefinido'])` rule
    (etl_pipeline.py:607-609).
    """
    cols = list(cols or df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        cond = F.col(c).isNull()
        if dtypes.get(c) == "string":
            cond = cond | (F.trim(F.col(c)) == "") | (F.col(c) == F.lit(sentinel))
        aggs.append(F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(f"_m_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `_m_{c}`" for c in cols)
    long = wide.select(
        F.col("_total").alias("total"),
        F.expr(f"stack({len(cols)}, {stack_args}) as (coluna, faltantes)"),
    )
    return long.select(
        "coluna",
        "total",
        "faltantes",
        (F.col("total") - F.col("faltantes")).alias("preenchidos"),
        F.round(F.col("faltantes") / F.col("total") * 100.0, scale).alias("pct_faltante"),
        F.round((F.col("total") - F.col("faltantes")) / F.col("total") * 100.0, scale).alias(
            "pct_preenchido"
        ),
    )
