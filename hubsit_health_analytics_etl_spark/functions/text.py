"""String/scalar functions — SURVEY.md §2.3 F1–F4.

All columnar JVM-side expressions; the reference's per-value Python
(unicodedata NFD strip at /root/reference/src/etl_pipeline.py:32-46,
currency lambdas at :217-223) is eliminated, not wrapped in a UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# pt-BR accent repertoire (upper-case; applied after upper()).
# Spark has no NFD builtin (≤4.x) — a translate table covers the
# reference's input language exactly (etl_pipeline.py:38-41 does
# NFD + combining-mark strip, same effect on pt-BR text).
_ACCENTS_SRC = "ÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
_ACCENTS_DST = "AAAAAAEEEEIIIIOOOOOUUUUCNY"


def strip_accents_upper(col: Column | str) -> Column:
    """upper() then fold pt-BR accented letters to ASCII."""
    return F.translate(F.upper(F.col(col) if isinstance(col, str) else col),
                       _ACCENTS_SRC, _ACCENTS_DST)


def normalize_key(col: Column | str) -> Column:
    """Join-key text normalization — mirrors `normalizar_texto_chave`
    (/root/reference/src/etl_pipeline.py:32-46): upper → accent strip →
    keep [A-Z0-9 ] → trim → collapse internal whitespace.

    Used to build resilient lookup-join keys (J1/J2) so 'Raio-X  Tórax '
    and 'RAIO X TORAX' join. Pure Catalyst expressions: stays inside
    whole-stage codegen, no Python boundary at 100 TB.
    """
    c = strip_accents_upper(col)
    c = F.regexp_replace(c, r"[^A-Z0-9 ]", "")
    c = F.regexp_replace(F.trim(c), r" +", " ")
    return c


def currency_to_double(col: Column | str) -> Column:
    """Parse 'R$ 1.234,56' decimal-comma money to double — F4
    (/root/reference/src/etl_pipeline.py:217-223). Unparseable → null
    (reference uses errors='coerce'); fill policy is the caller's."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c.cast("string"), r"[R$\s]", "")
    c = F.regexp_replace(c, r"\.", "")          # thousands '.'
    c = F.regexp_replace(c, ",", ".")           # decimal ',' → '.'
    return c.try_cast("double")
