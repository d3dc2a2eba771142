"""TPC-H-shaped multi-join workhorses (Q3/Q5/Q18/Q16/Q22), as-of join, hash sampling, upsert compaction, rolling frames.

Mechanical split of the former single-file EXT workload (VERDICT r13
#2); registration ORDER is load-bearing — modules import in sequence
via ``workloads/__init__.py`` so the ``@query`` registry is unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join bench workhorses (Q3 / Q5 analogues on the
# fixture schema) — exercise big-big joins + top-k + selective dates
# ---------------------------------------------------------------------------
@query(
    "shipping_priority",
    """
    WITH r AS (
      SELECT l.l_orderkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
      GROUP BY l.l_orderkey, orderdate
    )
    SELECT * FROM (
      SELECT l_orderkey, revenue, orderdate,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rank
      FROM r
    ) WHERE rank <= 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective date predicates (pushed to scan), broadcast
    customer dim, lineitem⋈orders join, global top-10 via
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = "1997-06-30 00:00:00"
    base = (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz")),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
    )
    agg = base.groupBy(
        "l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    top = agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "l_orderkey", "revenue", "orderdate", "rank"
    )


@query(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nacao,
           COUNT(*)::BIGINT AS itens,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_nationkey = c.c_nationkey
      AND EXTRACT(year FROM o.o_orderdate) = 1997
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: five-way join where every dim broadcasts; the
    customer-nation == supplier-nation theta condition rides on the
    joined row, so the fact still only shuffles for the final agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("n_nationkey", "n_name")
    )
    base = (
        lineitem.join(
            orders.filter(F.year("o_orderdate") == 1997).select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return base.groupBy(F.col("n_name").alias("nacao")).agg(
        F.count(F.lit(1)).alias("itens"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


@query(
    "market_share",
    """
    WITH base AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'AMERICA'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END), 2)
             AS nation_volume,
           ROUND(SUM(volume), 2) AS total_volume,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1 suppliers' share of AMERICA-market
    revenue per order year. Six-way join where every dimension
    (customer/supplier/nation×2/region) broadcasts — the fact tables
    shuffle once on the orderkey and once for the year agg; the share
    is a conditional-sum ratio computed in the same single aggregate
    pass (no second scan, no self-join)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_nat = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    base = (
        lineitem.select("l_orderkey", "l_suppkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .join(orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    is_nat = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0))
    return base.groupBy(F.col("o_year").cast("bigint").alias("o_year")).agg(
        F.round(F.sum(is_nat), 2).alias("nation_volume"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
        F.round(F.sum(is_nat) / F.sum("volume"), 6).alias("mkt_share"),
    )


@query(
    "returned_item_report",
    """
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name AS nacao,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             COUNT(*)::BIGINT AS itens
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, nacao, revenue, itens,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rnk FROM agg)
    WHERE rnk <= 20
    """,
)
def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter. The date filter pushes into the orders scan
    and the returnflag filter into the lineitem scan BEFORE the join;
    customer/nation broadcast; the top-20 is TakeOrderedAndProject on
    (rounded revenue desc, custkey) — never a global sort."""
    from ..operators.reshape import top_k

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nacao"))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "nacao")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("itens"),
        )
    )
    ranked = top_k(agg, [], [F.col("revenue").desc(), F.col("c_custkey").asc()], 20)
    return ranked.select(
        "c_custkey", "c_name", "nacao", "revenue", "itens",
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "customer_value_deciles",
    """
    WITH d AS (SELECT c_mktsegment, c_acctbal,
                      NTILE(10) OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey) AS decile
               FROM customer)
    SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
           COUNT(*)::BIGINT AS n,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM d GROUP BY c_mktsegment, decile
    """,
)
def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact account-balance deciles per market segment (NTILE with a
    deterministic (balance, key) order), profiled per decile. Exact
    n-tiles need a total order WITHIN each segment partition — fine
    when segments are many/balanced; for a global or hot-key decile at
    100 TB the scale path is percentile_approx bounds
    (priority_price_percentiles) instead of a single-reducer sort."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    d = customer.select(
        "c_mktsegment", "c_acctbal", F.ntile(10).over(w).cast("bigint").alias("decile")
    )
    return d.groupBy("c_mktsegment", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# Q18-style large orders: the AGGREGATED-SEMI-JOIN shape (HAVING on a
# child aggregate gating the parent join). cf. reference's
# capacity-gated joins (etl_pipeline.py perfil_agenda pre-aggregation).
# ---------------------------------------------------------------------------
LARGE_ORDER_QTY = 200


@query(
    "large_orders",
    f"""
    WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS q
                 FROM lineitem GROUP BY l_orderkey
                 HAVING SUM(l_quantity) > {LARGE_ORDER_QTY}),
    j AS (SELECT c.c_custkey, c.c_name, o.o_orderkey,
                 strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
                 ROUND(o.o_totalprice, 2) AS total_price,
                 ROUND(CAST(b.q AS DOUBLE), 2) AS total_qty
          FROM big b
          JOIN orders o ON b.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY total_price DESC, o_orderkey)
                      AS rank
          FROM j)
    SELECT c_custkey, c_name, o_orderkey, orderdate, total_price, total_qty,
           rank::BIGINT AS rank
    FROM r WHERE rank <= 100
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 largest orders by value among orders whose total
    lineitem quantity exceeds {LARGE_ORDER_QTY} (TPC-H Q18 shape).
    Plan: ONE aggregate shuffle on l_orderkey produces the small
    qualifying set, which then gates the orders join (the aggregate
    side is tiny post-HAVING → broadcastable); customer is a broadcast
    dim; the top-100 is TakeOrderedAndProject, never a global sort."""
    from ..operators.reshape import top_k

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > LARGE_ORDER_QTY)
    )
    j = (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round(F.col("q").cast("double"), 2).alias("total_qty"),
        )
    )
    ranked = top_k(j, [], [F.col("total_price").desc(), F.col("o_orderkey").asc()], 100)
    return ranked.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Q16-style supplier breadth: the DISTINCT-AGGREGATE shape (two-phase
# partial distinct under the shuffle) over a broadcast dim join.
# ---------------------------------------------------------------------------
@query(
    "supplier_breadth",
    """
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey)::BIGINT AS n_suppliers,
           COUNT(*)::BIGINT AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) excluding one brand and
    the PROMO type (TPC-H Q16 shape). The part dim broadcasts with the
    exclusion predicates pushed to its scan; COUNT(DISTINCT) plans the
    two-phase Expand + partial-aggregate split, so no single reducer
    ever sees all (group, supplier) pairs."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dim = part.filter(
        (F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q22-style dormant high-balance customers: the SCALAR-SUBQUERY +
# ANTI-JOIN shape (global aggregate broadcast into a filter, NOT IN
# against a filtered key set).
# ---------------------------------------------------------------------------
DORMANT_CUTOFF = "2001-01-01"


@query(
    "dormant_rich_customers",
    f"""
    WITH avg_bal AS (SELECT ROUND(AVG(c_acctbal), 2) AS a
                     FROM customer WHERE c_acctbal > 0),
    recent AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= '{DORMANT_CUTOFF}'),
    eligible AS (SELECT c.c_custkey, c.c_acctbal, c.c_nationkey
                 FROM customer c, avg_bal
                 WHERE c.c_acctbal > avg_bal.a
                   AND c.c_custkey NOT IN (SELECT o_custkey FROM recent))
    SELECT n.n_name AS nacao,
           COUNT(*)::BIGINT AS n_customers,
           ROUND(SUM(e.c_acctbal), 2) AS saldo_total
    FROM eligible e JOIN nation n ON e.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and NO orders
    since {DORMANT_CUTOFF}, aggregated per nation (TPC-H Q22 shape).
    The global average is a one-row aggregate cross-joined (broadcast)
    into the filter — the scalar-subquery pattern; the recency check
    is a broadcast LEFT ANTI join against the distinct recent
    custkeys (date filter pushed to the orders scan); nation is a
    broadcast dim. The average is rounded 2dp on both engines so a
    partition-order float ulp can never flip a boundary customer."""
    from ..operators.joins import anti_join

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("a")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= DORMANT_CUTOFF)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    eligible = anti_join(
        customer.crossJoin(F.broadcast(avg_bal)).filter(
            F.col("c_acctbal") > F.col("a")
        ),
        recent,
        keys=["c_custkey"],
    )
    return (
        eligible.join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nacao"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nacao")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("saldo_total"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator — DuckDB's native ASOF JOIN is the oracle)
# ---------------------------------------------------------------------------
@query(
    "asof_latest_order",
    """
    WITH r AS (  -- dedupe right to one row per (key, ts): max orderkey wins
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                         ORDER BY o_orderkey DESC) rn
            FROM orders) WHERE rn = 1
    ),
    j AS (
      SELECT e.event_type, e.ts, r.o_orderkey, r.o_orderdate
      FROM (SELECT event_type, user_id, CAST(ts AS TIMESTAMP) ts FROM events) e
      ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    )
    SELECT event_type,
           COUNT(*)::BIGINT AS n_eventos,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_com_pedido,
           ROUND(AVG(date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE))), 4)
             AS dias_desde_pedido
    FROM j GROUP BY event_type
    """,
)
def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each event picks up the user's most recent
    order as of the event time (union + running last_value — one
    shuffle, no range-join pair explosion). Oracle = DuckDB's native
    ASOF JOIN."""
    from ..operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join_backward(
        events.withColumnRenamed("user_id", "k"),
        orders.withColumnRenamed("o_custkey", "k"),
        key="k",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eventos"),
        F.sum(F.when(F.col("o_orderkey").isNotNull(), 1).otherwise(0)).alias("n_com_pedido"),
        F.round(F.avg(F.datediff(F.to_date("ts"), F.to_date("_asof_ts"))), 4).alias(
            "dias_desde_pedido"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling (stable train/test splits)
# ---------------------------------------------------------------------------
from ..operators.sampling import sql_hash_bucket  # noqa: E402


@query(
    "hash_sample_events",
    f"""
    SELECT event_type,
           COUNT(*)::BIGINT AS n_total,
           CAST(SUM(CASE WHEN {sql_hash_bucket("event_id")} < 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sample_10pct,
           CAST(SUM(CASE WHEN {sql_hash_bucket("event_id", salt="v2")} < 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sample_10pct_v2
    FROM events GROUP BY event_type
    """,
)
def q_hash_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-hash sampling: membership is a pure function of the row key
    (and salt), so samples are reproducible across runs/engines and
    need no shuffle — unlike rand()-based sampling."""
    from ..operators.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(hash_bucket("event_id") < 10, 1).otherwise(0)).alias("n_sample_10pct"),
        F.sum(F.when(hash_bucket("event_id", salt="v2") < 10, 1).otherwise(0)).alias(
            "n_sample_10pct_v2"
        ),
    )


# ---------------------------------------------------------------------------
# Upsert compaction (SCD-1 latest-record-wins) — the Delta-less merge
# pattern for snapshotting a keyed stream of updates
# ---------------------------------------------------------------------------
@query(
    "latest_order_snapshot",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def q_latest_order_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat orders as keyed updates and compact to latest-per-key
    (deterministic tie-break). One shuffle on the key; at scale this is
    the periodic snapshot job over an append-only update log."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# Window FRAME analytics: rolling 7-day revenue per customer (range frame)
# ---------------------------------------------------------------------------
@query(
    "rolling_7d_revenue",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS receita_7d
    FROM orders
    """,
)
def q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: the 7-day trailing revenue per customer
    (frames are absent from the reference — SURVEY §2.6). Ordered by
    epoch-day so the range arithmetic is integral and engine-portable."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("receita_7d"),
    )


