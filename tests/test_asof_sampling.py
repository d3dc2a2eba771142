"""Behavioral tests: as-of join semantics on crafted rows; hash-split
stability and disjointness."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_asof_backward_semantics(spark):
    from hubsit_health_analytics_etl_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, "2024-01-10"), (1, "2024-01-01"), (2, "2024-01-05"), (3, "2024-01-05")],
        "k int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-03", 100.0),
            (1, "2024-01-10", 200.0),   # equal-ts match is inclusive
            (1, "2024-01-10", 250.0),   # tie on ts -> greatest tie_break wins
            (2, "2024-01-09", 300.0),   # after the left row -> no match
        ],
        "k int, rts string, px double",
    ).withColumn("rts", F.col("rts").cast("timestamp_ntz"))

    out = {
        (r.k, str(r.ts)[:10]): (r.px, str(r._asof_ts)[:10] if r._asof_ts else None)
        for r in asof_join_backward(
            left, right, key="k", left_ts="ts", right_ts="rts",
            payload=["px"], tie_break="px",
        ).collect()
    }
    assert out[(1, "2024-01-10")] == (250.0, "2024-01-10")  # inclusive + tiebreak
    assert out[(1, "2024-01-01")] == (None, None)           # nothing on/before
    assert out[(2, "2024-01-05")] == (None, None)           # right row is later
    assert out[(3, "2024-01-05")] == (None, None)           # key absent on right


def test_asof_payload_row_stays_atomic(spark):
    """If the most recent right row carries a NULL in one payload
    column, the output must keep that null — not backfill it from an
    older right row (per-column carry would mix rows)."""
    from hubsit_health_analytics_etl_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, "2024-01-10")], "k int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-02", 100.0, "old-vendor"),
            (1, "2024-01-08", 200.0, None),  # most recent: vendor NULL
        ],
        "k int, rts string, px double, vendor string",
    ).withColumn("rts", F.col("rts").cast("timestamp_ntz"))

    row = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload=["px", "vendor"], tie_break="px",
    ).collect()[0]
    assert row.px == 200.0
    assert row.vendor is None  # NOT "old-vendor"
    assert str(row._asof_ts)[:10] == "2024-01-08"


def test_hash_split_stable_disjoint_exhaustive(spark):
    from hubsit_health_analytics_etl_spark.operators.sampling import (
        hash_sample,
        train_test_split,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    train, test = train_test_split(orders, "o_orderkey", test_pct=20)
    n, ntr, nte = orders.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.join(test, "o_orderkey").count() == 0  # disjoint
    assert 0.1 < nte / n < 0.3  # ~20%
    # stability: same membership on a re-read (new lineage)
    orders2 = load_table(spark, "/root/testdata/sf0.001", "orders").repartition(7)
    _, test2 = train_test_split(orders2, "o_orderkey", test_pct=20)
    assert sorted(r.o_orderkey for r in test.select("o_orderkey").collect()) == sorted(
        r.o_orderkey for r in test2.select("o_orderkey").collect()
    )
    # different salt -> different (but stable) sample
    s1 = hash_sample(orders, "o_orderkey", 10)
    s2 = hash_sample(orders, "o_orderkey", 10, salt="v2")
    ids1 = {r.o_orderkey for r in s1.select("o_orderkey").collect()}
    ids2 = {r.o_orderkey for r in s2.select("o_orderkey").collect()}
    assert ids1 != ids2


def test_asof_join_plans_single_shuffle(spark):
    """The union+window formulation must shuffle once on the key —
    no range-join pair explosion, no cartesian."""
    from hubsit_health_analytics_etl_spark.operators.asof import asof_join_backward
    from hubsit_health_analytics_etl_spark.plans.explain import physical_plan
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.col("user_id").alias("k"), "ts", "event_type"
    )
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        F.col("o_custkey").alias("k"), "o_orderdate", "o_orderkey"
    )
    out = asof_join_backward(
        events, orders, "k", "ts", "o_orderdate", ["o_orderkey"], tie_break="o_orderkey"
    )
    p = physical_plan(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # exchanges: dedup window (key,ts) + main window (key) — both hash
    # on k; no join exchange at all
    import re

    assert len(re.findall(r"\n\(\d+\) Exchange", p)) <= 2


def test_temperature_sample_upsamples_low_resource_strata(spark):
    """alpha=0.5 must give the low-resource languages a HIGHER keep
    rate than the dominant one (the whole point of temperature
    rebalancing), stay within each stratum (rate <= 1), and be exactly
    deterministic across runs."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.operators.sampling import (
        temperature_sample,
    )
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = temperature_sample(docs, "lang", "doc_id", alpha=0.5, budget=300)
    rates = {r["lang"]: r["rate"] for r in out.select("lang", "rate").distinct().collect()}
    n_by_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    dominant = max(n_by_lang, key=n_by_lang.get)   # en: 193 docs
    smallest = min(n_by_lang, key=n_by_lang.get)   # de: 71 docs
    assert rates[smallest] > rates[dominant]
    assert all(0 < r <= 1 for r in rates.values())
    # membership is replay-stable (hash-based, not rand())
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in temperature_sample(docs, "lang", "doc_id", alpha=0.5, budget=300).select("doc_id").collect()}
    assert a == b
    # kept count per language lands near its target (binomial noise)
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, rate in rates.items():
        target = rate * n_by_lang[lang]
        assert abs(kept.get(lang, 0) - target) <= 3 * (target ** 0.5) + 1


def test_temperature_sample_no_per_stratum_sort(spark):
    """The keep decision must be a map filter after a tiny-aggregate
    broadcast join: no Window/Sort over the corpus side (a skewed
    stratum would serialize on one reducer otherwise)."""
    from hubsit_health_analytics_etl_spark.operators.sampling import (
        temperature_sample,
    )
    from hubsit_health_analytics_etl_spark.plans.explain import physical_plan
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = temperature_sample(docs, "lang", "doc_id", alpha=0.5, budget=300)
    body = physical_plan(out).split("== Physical Plan ==")[-1]
    # the rates side must broadcast; the only Window runs over the
    # |strata|-row counts aggregate behind that broadcast — the corpus
    # side reaches the join via scan+filter, no sort, no window
    assert "BroadcastHashJoin" in body
    corpus_side = body.split("BroadcastExchange")[0]
    assert "Sort" not in corpus_side and "Window" not in corpus_side
