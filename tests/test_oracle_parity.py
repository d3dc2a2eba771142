"""Every queries() entry must hash-match its oracle_sql() twin — the
local sf0.001 replica of the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .oracle_check import compare, duckdb_conn


def _workload():
    from hubsit_health_analytics_etl_spark import workload

    return workload


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


def _names():
    w = _workload()
    return sorted(w.ORACLES.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, con, name):
    w = _workload()
    df = w.QUERIES[name](spark, SF_SMOKE)
    problems = compare(df, con, w.ORACLES[name], name)
    assert not problems, "\n".join(problems)


def test_all_queries_return_rows(spark):
    w = _workload()
    for name, fn in w.QUERIES.items():
        n = fn(spark, SF_SMOKE).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
