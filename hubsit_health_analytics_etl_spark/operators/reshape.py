"""Reshaping operators — SURVEY.md §2.5 A3/A6/A7/A10, §2.6 W1/O1/U1/U2.

pivot with explicit values (column backfill, etl_pipeline.py:398-401),
grouping-sets profile in ONE pass (the reference loops dims + concat,
:501-528 — Catalyst's Expand does it with a single shuffle), stack
unpivot (:591-596), percent-of-total window (:575-576,593), top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def pivot_counts(
    df: DataFrame,
    row_key: str | Column,
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column | None = None,
) -> DataFrame:
    """A10 crosstab: groupBy(row_key).pivot(col, explicit values).
    Explicit values = deterministic output schema (absent statuses
    still produce a zero column — reference backfills at :398-401)
    AND a single-pass plan (no values-discovery job)."""
    g = df.groupBy(row_key).pivot(pivot_col, list(pivot_values))
    out = g.agg(agg) if agg is not None else g.count()
    return out.na.fill(0, list(pivot_values))


def profile_union(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Sequence[Column],
    dim_name_col: str = "dimensao",
    dim_value_col: str = "valor",
    exclude_value: str | None = "Indefinido",
    global_label: str | None = None,
) -> DataFrame:
    """A3 multi-dimension profile via GROUPING SETS — one shuffle.

    The reference computes one group-by per dimension then concatenates
    (etl_pipeline.py:501-528). Semantically that's
    GROUPING SETS ((dim1),(dim2),...): Catalyst plans a single Expand +
    hash aggregate, so a 100 TB fact is scanned and shuffled once, not
    len(dims) times. The 'Indefinido' per-dim exclusion filter
    (:511) is applied via a per-row validity mask before expansion.

    ``global_label`` adds the grand-total grouping set ``()`` and
    labels its row (dim_name_col=dim_value_col=global_label): headline
    scalars ride the same single pass instead of a second job. The
    global row counts ALL input rows — the exclude_value mask only
    nulls dim KEYS, it drops no rows.
    """
    sets = [[d] for d in dims]
    if global_label is not None:
        sets = sets + [[]]
    gdf = df
    if exclude_value is not None:
        # rows with dim == exclude_value must not count toward that
        # dim's profile; null them and drop the null group at the end
        # (pandas groupby drops NaN keys, so this matches :511+groupby)
        for d in dims:
            gdf = gdf.withColumn(
                d, F.when(F.col(d) == F.lit(exclude_value), F.lit(None)).otherwise(F.col(d))
            )
    # grouping() flags must be computed inside agg()
    gflags = [F.grouping(d).alias(f"_g_{d}") for d in dims]
    grouped = gdf.groupingSets(sets, *[F.col(d) for d in dims]).agg(*gflags, *aggs)
    # collapse the dim columns to (dimensao, valor) via the flags
    name_expr = None
    val_expr = None
    for d in dims:
        cond = F.col(f"_g_{d}") == 0
        name_expr = F.when(cond, F.lit(d)) if name_expr is None else name_expr.when(cond, F.lit(d))
        val_expr = F.when(cond, F.col(d)) if val_expr is None else val_expr.when(cond, F.col(d))
    if global_label is not None:
        name_expr = name_expr.otherwise(F.lit(global_label))
        val_expr = val_expr.otherwise(F.lit(global_label))
    metric_cols = [c for c in grouped.columns if c not in dims and not c.startswith("_g_")]
    out = grouped.select(
        name_expr.alias(dim_name_col),
        val_expr.alias(dim_value_col),
        *[F.col(c) for c in metric_cols],
    )
    # drop the null-masked groups (they were exclude_value / null rows)
    return out.filter(F.col(dim_value_col).isNotNull())


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "indicador",
    value_name: str = "quantidade",
) -> DataFrame:
    """A7/U2: wide KPI row → long (indicador, quantidade) — the
    reference's dict→rows block (etl_pipeline.py:591-596)."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)


def percent_of_total(
    count_col: Column | str, partition_by: Sequence[str] = (), scale: int = 2
) -> Column:
    """W1: percent of (partitioned) total via an empty-frame window —
    the reference's scalar-total percentages (etl_pipeline.py:575-576).
    Empty partitionBy = single-partition window: fine for small
    aggregate outputs (this runs AFTER the group-by, on #groups rows,
    never on the raw fact)."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    w = Window.partitionBy(*[F.col(p) for p in partition_by])
    return F.round(c / F.sum(c).over(w) * 100.0, scale)


def top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """EXT ranking: row_number top-k per partition. Deterministic
    ordering is the caller's job (include a unique tie-break column).
    For global top-k (empty partition_by) prefer orderBy().limit(k) —
    Spark's TakeOrderedAndProject avoids a single-reducer sort."""
    if not partition_by:
        sorted_df = df.orderBy(*order_by).limit(k)
        w = Window.orderBy(*order_by)
        return sorted_df.withColumn(rank_col, F.row_number().over(w))
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
