"""Temporal derivations — SURVEY.md §2.3 F5–F8.

Determinism rule (SURVEY.md §4): anything the reference computes from
``datetime.now()`` (/root/reference/src/etl_pipeline.py:169,258,281)
takes an explicit ``as_of`` literal here, so results are reproducible
and oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_UNIT_SECONDS = {"seconds": 1.0, "minutes": 60.0, "hours": 3600.0, "days": 86400.0}

# dd/MM/yyyy-first patterns the reference parses with dayfirst=True
# (/root/reference/src/etl_pipeline.py:183-194).
DAYFIRST_PATTERNS = ["d/M/yyyy H:mm:ss", "d/M/yyyy H:mm", "d/M/yyyy"]


def parse_dayfirst_timestamp(col: Column | str, patterns: list[str] | None = None) -> Column:
    """Multi-pattern tolerant timestamp parse (F5). Bad values → null,
    matching pandas errors='coerce'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(p)) for p in (patterns or DAYFIRST_PATTERNS)])


def duration(end: Column | str, start: Column | str, unit: str = "hours") -> Column:
    """Timestamp difference in fractional units (F6) — the reference's
    `(a - b).dt.total_seconds()/3600` (etl_pipeline.py:243-247,443,454).
    Null if either side is null (np.where guard at :245)."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    secs = F.unix_timestamp(e) - F.unix_timestamp(s)
    return secs / F.lit(_UNIT_SECONDS[unit])


def age_years(birth: Column | str, as_of: Column) -> Column:
    """Age in fractional years (F7): `(as_of - birth).days / 365.25`
    (etl_pipeline.py:279-282) — columnar, no per-row lambda.

    pandas timedelta ``.days`` floors *elapsed 24 h periods* (toward
    -inf), while ``datediff`` counts calendar-date boundaries; when the
    birth time-of-day exceeds as_of's they differ by one day, which can
    flip an age band exactly at a boundary.  floor(Δseconds/86400)
    reproduces the pandas semantics bit-for-bit.
    """
    b = F.col(birth) if isinstance(birth, str) else birth
    days = F.floor((F.unix_timestamp(as_of) - F.unix_timestamp(b)) / F.lit(86400))
    return days / F.lit(365.25)


def shift_of_day(ts: Column | str) -> Column:
    """Hour-of-day → shift label (F8, `definir_turno`,
    etl_pipeline.py:78-83): 6–11 MANHA, 12–17 TARDE, else NOITE,
    null → Indefinido."""
    t = F.col(ts) if isinstance(ts, str) else ts
    h = F.hour(t)
    return (
        F.when(t.isNull(), F.lit("Indefinido"))
        .when(h.between(6, 11), F.lit("MANHA"))
        .when(h.between(12, 17), F.lit("TARDE"))
        .otherwise(F.lit("NOITE"))
    )
