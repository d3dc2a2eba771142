"""Null policies — SURVEY.md §2.3 F14 + the div-by-zero rule (§7.3).

The reference computes ratios then `fillna(0)`
(/root/reference/src/etl_pipeline.py:483-485,543,674-676); we make the
policy explicit: denominator 0 or null → fill value, never inf/null.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def safe_div(num: Column, den: Column, fill: float = 0.0) -> Column:
    """num/den with denominator 0/null → ``fill`` (double)."""
    return (
        F.when(den.isNull() | (den == F.lit(0)), F.lit(float(fill)))
        .otherwise(num.cast("double") / den.cast("double"))
    )


def safe_rate(num: Column, den: Column, scale: int = 2, pct: bool = True) -> Column:
    """Percentage rate rounded like the reference's `.round(2)`
    (etl_pipeline.py:483-485)."""
    r = safe_div(num, den)
    if pct:
        r = r * F.lit(100.0)
    return F.round(r, scale)
