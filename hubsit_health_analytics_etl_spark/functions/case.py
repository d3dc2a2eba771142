"""CASE-expression builders — SURVEY.md §2.3 F9/F10/F13.

The reference's hottest row-at-a-time Python (`df.apply(definir_status_final,
axis=1)`, /root/reference/src/etl_pipeline.py:265-277; `pd.cut` banding
:284-288; dict `.map().fillna()` :388-394) all become ordered
`when()` chains: whole-stage-codegen friendly, zero Python at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column


def status_machine(rules: Sequence[tuple[Column, str]], default: str) -> Column:
    """First-match-wins priority CASE (F10). ``rules`` is an ordered
    list of (condition, label) — exactly the if/elif chain of
    `definir_status_final` (etl_pipeline.py:265-277):
    ATENDIDO > NO-SHOW > CANCELAMENTO_TARDIO > CANCELADO > AGENDADO.
    """
    expr: Column | None = None
    for cond, label in rules:
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


def band(
    col: Column | str,
    bins: Sequence[float],
    labels: Sequence[str],
    other: str = "Indefinido",
) -> Column:
    """Half-open [lo, hi) banding (F9) reproducing
    `pd.cut(..., right=False)` + `'Indefinido'` backfill
    (etl_pipeline.py:284-288): len(labels) == len(bins) - 1; values
    outside [bins[0], bins[-1]) or null → ``other``.
    """
    if len(labels) != len(bins) - 1:
        raise ValueError("need len(labels) == len(bins) - 1")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for lo, hi, label in zip(bins[:-1], bins[1:], labels):
        cond = (c >= F.lit(lo)) & (c < F.lit(hi))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(other))


def case_map(col: Column | str, mapping: dict[str, str], default: str) -> Column:
    """Literal dict remap (F13): `.map(mapa).fillna(default)`
    (etl_pipeline.py:388-394,572) as a CASE chain."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == F.lit(k), F.lit(v)) if expr is None else expr.when(c == F.lit(k), F.lit(v))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))
