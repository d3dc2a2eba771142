"""Hash pseudonymization — SURVEY.md §2.3 F16.

The reference's upstream job derives anonymous IDs with
`sha2(concat(main, secondary), 256)` (/root/reference/src/Criptografia.py:12-42,
114-126). Generalized here to any column list, salt-ready. Pure JVM
`sha2` — distributes trivially.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def sha256_hex(*cols: Column | str, salt: str | None = None) -> Column:
    """sha2-256 hex of the concatenation of ``cols`` (nulls skipped,
    like SQL concat_ws)."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    if salt:
        parts.insert(0, F.lit(salt))
    return F.sha2(F.concat_ws("", *parts), 256)


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    out: str,
    salt: str | None = None,
    drop_source: bool = False,
) -> DataFrame:
    """Add a pseudonymous ID column ``out`` from ``cols``; optionally
    drop the identifying sources (the reference drops CPF/Nome after
    hashing, Criptografia.py:129-171)."""
    res = df.withColumn(out, sha256_hex(*cols, salt=salt))
    if drop_source:
        res = res.drop(*cols)
    return res
