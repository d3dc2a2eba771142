"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet, sort columns by
name, sort rows, compare values (exact after the workload's own
rounding). Used by tests/test_oracle_parity.py at sf0.001 so every
mismatch is caught before the driver's sf0.01 gate."""

from __future__ import annotations

import datetime as _dt
import math
from pathlib import Path

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent at float64 precision
        return repr(v + 0.0)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return str(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def _normalize(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows, key=lambda t: tuple("" if x is None else str(x) for x in t))


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Return list of problem descriptions; empty = match."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
        )
        return problems
    if len(sp) != len(du):
        problems.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
    a, b = _normalize(sp), _normalize(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        extra_a = [x for x in a if x not in b][:3]
        extra_b = [y for y in b if y not in a][:3]
        problems.append(
            f"{name}: value mismatch ({len(diffs)} differing aligned rows); "
            f"spark-only={extra_a} duckdb-only={extra_b} cols={sorted(sp.columns)}"
        )
    return problems
