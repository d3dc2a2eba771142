"""Unit tests for the core expression builders (SURVEY.md §5: the
reference has no tests; CASE edges / normalization idempotence / null
policies are the engine-feature behaviors worth pinning)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hubsit_health_analytics_etl_spark.functions.case import band, case_map, status_machine
from hubsit_health_analytics_etl_spark.functions.nulls import safe_div
from hubsit_health_analytics_etl_spark.functions.temporal import (
    duration,
    parse_dayfirst_timestamp,
    shift_of_day,
)
from hubsit_health_analytics_etl_spark.functions.text import currency_to_double, normalize_key


def _vals(spark, col, rows, schema="v string"):
    df = spark.createDataFrame([(r,) for r in rows], schema)
    return [r[0] for r in df.select(col.alias("out")).collect()]


def test_normalize_key(spark):
    out = _vals(
        spark,
        normalize_key("v"),
        ["  Raio-X  Tórax ", "RAIO X TORAX", "ação José!!", None],
    )
    assert out == ["RAIOX TORAX", "RAIO X TORAX", "ACAO JOSE", None]


def test_normalize_key_idempotent(spark):
    once = _vals(spark, normalize_key("v"), ["  Ácaí--123  b "])
    twice = _vals(spark, normalize_key(normalize_key("v")), ["  Ácaí--123  b "])
    assert once == twice


def test_currency_parse(spark):
    out = _vals(spark, currency_to_double("v"), ["R$ 1.234,56", "10,5", "abc", None])
    assert out == [1234.56, 10.5, None, None]


def test_band_half_open_edges(spark):
    # pd.cut(right=False): [lo, hi) — hi edge falls into next band;
    # out-of-range and null → Indefinido (etl_pipeline.py:284-288)
    c = band("v", [0, 13, 18, 40, 60, 120], ["0-12", "13-17", "18-39", "40-59", "60+"])
    df = spark.createDataFrame(
        [(x,) for x in [0.0, 12.99, 13.0, 17.99, 18.0, 59.99, 60.0, 119.99, 120.0, -1.0, None]],
        "v double",
    )
    out = [r[0] for r in df.select(c.alias("b")).collect()]
    assert out == [
        "0-12", "0-12", "13-17", "13-17", "18-39", "40-59", "60+", "60+",
        "Indefinido", "Indefinido", "Indefinido",
    ]


def test_status_machine_priority(spark):
    # first-match-wins: ATENDIDO beats NO-SHOW (etl_pipeline.py:265-277)
    df = spark.createDataFrame(
        [(True, True), (False, True), (False, False)], "a boolean, n boolean"
    )
    c = status_machine([(F.col("a"), "ATENDIDO"), (F.col("n"), "NO-SHOW")], "AGENDADO")
    out = [r[0] for r in df.select(c.alias("s")).collect()]
    assert out == ["ATENDIDO", "NO-SHOW", "AGENDADO"]


def test_case_map_default(spark):
    c = case_map("v", {"A": "Atendido", "C": "Cancelado"}, "Outro")
    assert _vals(spark, c, ["A", "C", "X", None]) == ["Atendido", "Cancelado", "Outro", "Outro"]


def test_shift_of_day(spark):
    df = spark.createDataFrame(
        [("2024-01-01 06:00:00",), ("2024-01-01 11:59:00",), ("2024-01-01 12:00:00",),
         ("2024-01-01 17:59:59",), ("2024-01-01 18:00:00",), ("2024-01-01 03:00:00",), (None,)],
        "v string",
    )
    out = [
        r[0]
        for r in df.select(shift_of_day(F.col("v").cast("timestamp")).alias("s")).collect()
    ]
    assert out == ["MANHA", "MANHA", "TARDE", "TARDE", "NOITE", "NOITE", "Indefinido"]


def test_duration_and_parse(spark):
    df = spark.createDataFrame([("31/12/2023 23:30", "01/01/2024 00:30")], "a string, b string")
    pa, pb = parse_dayfirst_timestamp("a"), parse_dayfirst_timestamp("b")
    out = df.select(duration(pb, pa, "hours").alias("h")).collect()[0][0]
    assert abs(out - 1.0) < 1e-9


def test_safe_div_zero_and_null(spark):
    df = spark.createDataFrame([(1.0, 0.0), (1.0, None), (9.0, 3.0)], "a double, b double")
    out = [r[0] for r in df.select(safe_div(F.col("a"), F.col("b")).alias("d")).collect()]
    assert out == [0.0, 0.0, 3.0]


def test_package_lazy_api_exports_resolve():
    """Every name in the package's lazy top-level API resolves to a
    callable (the one-import surface a reference user switches to)."""
    import hubsit_health_analytics_etl_spark as h

    assert len(h.__all__) >= 30
    for name in h.__all__:
        assert callable(getattr(h, name)), name
    assert "run_pipeline" in dir(h)
