"""Conditional-aggregation kernel — SURVEY.md §2.5 (the single most
important reference pattern).

Every reference group-by aggregates with per-group Python lambdas —
e.g. `('Status_Consolidado', lambda x: (x == 'ATENDIDO').sum())`
(/root/reference/src/etl_pipeline.py:478-480,493-496,514-517,535-539,
631-634). The distributed-safe translation is `sum(when(cond, x))`:
Catalyst splits it into partial (map-side) + final aggregation
automatically, so the shuffle carries one partial aggregate per
(group, metric), not raw rows — this is what makes the pattern hold at
100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def count_if(cond: Column) -> Column:
    """COUNT rows matching ``cond`` → long (0 for empty groups, like
    the reference's boolean .sum())."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def sum_if(col: Column | str, cond: Column, otherwise: float = 0.0) -> Column:
    """SUM of ``col`` over rows matching ``cond`` — the A4 pattern
    (etl_pipeline.py:537-539), stated by intent instead of the
    reference's index-aligned cross-filter lambdas."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.when(cond, c).otherwise(F.lit(otherwise)))


def avg_if(col: Column | str, cond: Column) -> Column:
    """AVG of ``col`` over rows matching ``cond`` (non-matching rows
    excluded, not zero-filled)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.avg(F.when(cond, c))
