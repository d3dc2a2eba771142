"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; explicit salting remains the tool when a single group key
is pathologically hot in an AGGREGATION (AQE skew handling applies to
joins, not group-bys) or when AQE is unavailable.

Two-phase salted aggregation: key → (key, salt) groupBy (spreads the
hot key over `n_salts` reducers, partial aggregate per salt) → final
groupBy(key) over the tiny per-salt partials. Works for any algebraic
aggregate (sum/count/min/max); averages must be carried as (sum, count).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — deterministic given the
    Spark seed handling is not required for correctness (salt only
    routes rows; results are salt-invariant)."""
    return df.withColumn(salt_col, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (merge_fn, partial_expr) where
    merge_fn ∈ {'sum','min','max'} recombines the per-salt partials,
    e.g. {'total': ('sum', F.count(F.lit(1))),
          'receita': ('sum', F.sum('valor')),
          'maior': ('max', F.max('valor'))}.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join_skewed_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted equi-join for a skewed fact key against a small dim when
    broadcast is impossible (dim too big) and AQE unavailable: salt the
    fact, explode the dim across all salts, join on (key, salt).
    Prefer broadcast() or AQE skew-join when applicable — this
    multiplies the dim by n_salts."""
    salted_fact = with_salt(fact, n_salts)
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")


def key_skew_report(
    df: DataFrame,
    key: str,
    top: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Skew diagnosis BEFORE the salting decision: the ``top`` heaviest
    keys with their row share and the salt factor that would bring
    each back under ``target_rows_per_task`` rows per task —
    ceil(n_rows / target), 1 = no salting needed. One count-groupBy +
    TakeOrderedAndProject; run it on a sample or the key column only
    at 100 TB (the scan prunes to one column). The output feeds
    with_salt/salted_agg/salted_join_skewed_left directly."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("_total"))
    topk = counts.orderBy(
        F.col("n_rows").desc(), F.col("key_value").asc()
    ).limit(top)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key_value").asc())
    return (
        topk.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "key_value",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("row_share"),
            F.ceil(F.col("n_rows") / F.lit(target_rows_per_task))
            .cast("bigint")
            .alias("salt_factor"),
        )
    )


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    top: int = 10,
) -> DataFrame:
    """Pre-join cardinality diagnosis: for the ``top`` keys by OUTPUT
    amplification, the per-side row counts and their product (= the
    rows this key alone will emit from an inner equi-join). The
    100 TB failure this prevents: a key assumed unique on one side
    that isn't (a 'dimension' with duplicate business keys) turns a
    join into a quadratic blow-up that surfaces only as a job that
    never finishes — two cheap count-aggregations surface it BEFORE
    the join runs. Diagnostic, not enforcement: feed it to
    assert_join_safe for the loud-failure form."""
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_right"))
    both = lc.join(rc, keys)
    out = both.select(
        *keys,
        F.col("n_left").cast("bigint").alias("n_left"),
        F.col("n_right").cast("bigint").alias("n_right"),
        (F.col("n_left") * F.col("n_right")).cast("bigint").alias("n_out"),
    )
    return out.orderBy(F.col("n_out").desc(), *keys).limit(top)


def assert_join_safe(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    max_rows_per_key: int = 10_000_000,
) -> None:
    """Loud pre-join guard: raises with the offending keys when any
    single join key would emit more than ``max_rows_per_key`` output
    rows. Costs two count-aggregations + a top-k collect (cheap next
    to the join it protects); call it before any join whose key
    uniqueness is an ASSUMPTION rather than a constraint."""
    worst = join_explosion_report(left, right, keys, top=5).collect()
    bad = [r for r in worst if r["n_out"] > max_rows_per_key]
    if bad:
        detail = ", ".join(
            f"{tuple(r[k] for k in keys)}: {r['n_left']}x{r['n_right']}"
            f"={r['n_out']}"
            for r in bad
        )
        raise ValueError(
            f"assert_join_safe: {len(bad)} join key(s) exceed "
            f"{max_rows_per_key} output rows — {detail}. The join would "
            "explode; dedup the offending side, aggregate before "
            "joining, or raise the guard deliberately."
        )
