"""Per-key sequential monitors — the keyed batch anchor of the
streaming CUSUM family (``streaming/cusum.py`` is the stateful twin;
``daily_revenue_cusum`` in w16 is the single-series member).

Registration order note: imports after w01–w19 (registry tail — the
driver-gate rotation spends its window on the verification backlog).
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# Per-priority CUSUM — one monitor per order-priority's daily revenue,
# all five folded in ONE keyed window pass (the deployment shape: a
# fleet of monitors sharing a partitioning, not one query per series).
# Parameters are tuned GLOBALLY across the fleet (μ = grand mean,
# k = MAD/2, h = 5·MAD over all (key, day) points) — the frozen-
# reference contract the streaming twin consumes, and what makes the
# five series comparable on one dashboard. Page's prefix identity
# keeps the whole detector in integer window arithmetic (w16
# daily_revenue_cusum's derivation, partitioned by key).
# ---------------------------------------------------------------------------
@query(
    "priority_revenue_cusum",
    """
    WITH d AS MATERIALIZED (
      SELECT o_orderpriority AS skey, o_orderdate AS day,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS x_c
      FROM orders GROUP BY 1, 2),
    g1 AS (SELECT (SUM(x_c) // COUNT(*))::BIGINT AS mu_c FROM d),
    g AS (SELECT g1.mu_c,
                 (SUM(abs(d.x_c - g1.mu_c)) // COUNT(*))::BIGINT AS mad_c
          FROM d CROSS JOIN g1 GROUP BY g1.mu_c),
    p AS (SELECT d.skey, d.day, d.x_c, g.mad_c,
                 SUM(d.x_c - g.mu_c - g.mad_c // 2)
                   OVER (PARTITION BY d.skey ORDER BY d.day)::BIGINT AS p_t,
                 SUM(g.mu_c - g.mad_c // 2 - d.x_c)
                   OVER (PARTITION BY d.skey ORDER BY d.day)::BIGINT AS q_t
          FROM d CROSS JOIN g),
    s AS (SELECT skey, day, x_c, mad_c,
                 (p_t - LEAST(0, MIN(p_t) OVER (PARTITION BY skey ORDER BY day)))::BIGINT
                   AS s_pos_c,
                 (q_t - LEAST(0, MIN(q_t) OVER (PARTITION BY skey ORDER BY day)))::BIGINT
                   AS s_neg_c
          FROM p)
    SELECT skey, CAST(day AS VARCHAR) AS day, x_c, s_pos_c, s_neg_c,
           (CASE WHEN s_pos_c > 5 * mad_c OR s_neg_c > 5 * mad_c
                 THEN 1 ELSE 0 END)::BIGINT AS alarm
    FROM s
    """,
)
def q_priority_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(skey, day, x_c, s_pos_c, s_neg_c, alarm): two-sided CUSUM per
    order priority under fleet-tuned integer parameters. One
    orders-scan aggregate builds the five series; μ and MAD broadcast
    as scalars; every window partitions by skey (the per-key pass is
    ≤ #calendar-days rows, all keys in parallel — no single-partition
    funnel). The streaming twin (streaming/cusum.py) replays this
    exact trajectory statefully under the same frozen parameters —
    the stream-vs-batch pytest proves the recurrence ≡ the prefix
    identity row-for-row; THIS row gives the family its
    driver-checked batch anchor."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("skey"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint)"
            ).alias("x_c")
        )
    )
    g1 = d.agg(F.expr("cast(sum(x_c) div count(1) as bigint)").alias("mu_c"))
    g = (
        d.crossJoin(F.broadcast(g1))
        .groupBy("mu_c")
        .agg(
            F.expr("cast(sum(abs(x_c - mu_c)) div count(1) as bigint)").alias(
                "mad_c"
            )
        )
    )
    w = Window.partitionBy("skey").orderBy("day")
    p = d.crossJoin(F.broadcast(g)).select(
        "skey",
        "day",
        "x_c",
        "mad_c",
        F.sum(F.col("x_c") - F.col("mu_c") - F.expr("mad_c div 2"))
        .over(w)
        .cast("bigint")
        .alias("p_t"),
        F.sum(F.col("mu_c") - F.expr("mad_c div 2") - F.col("x_c"))
        .over(w)
        .cast("bigint")
        .alias("q_t"),
    )
    s = p.select(
        "skey",
        "day",
        "x_c",
        "mad_c",
        (F.col("p_t") - F.least(F.lit(0), F.min("p_t").over(w)))
        .cast("bigint")
        .alias("s_pos_c"),
        (F.col("q_t") - F.least(F.lit(0), F.min("q_t").over(w)))
        .cast("bigint")
        .alias("s_neg_c"),
    )
    return s.select(
        "skey",
        F.col("day").cast("string").alias("day"),
        "x_c",
        "s_pos_c",
        "s_neg_c",
        (
            (F.col("s_pos_c") > 5 * F.col("mad_c"))
            | (F.col("s_neg_c") > 5 * F.col("mad_c"))
        )
        .cast("bigint")
        .alias("alarm"),
    )
