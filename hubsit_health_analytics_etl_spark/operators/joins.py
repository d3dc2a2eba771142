"""Join operators — SURVEY.md §2.4 J1–J3.

Every reference join is a small-dimension lookup
(/root/reference/src/etl_pipeline.py:202-233 price, :655-661 capacity)
— the natural Spark physical plan is a **broadcast hash join**: no
shuffle of the 100 TB fact side, the dim ships to every executor once.
`lookup_join(..., broadcast_dim=True)` forces the hint; AQE would pick
it anyway under the autoBroadcastJoinThreshold, but the explicit hint
survives stats-less sources.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import normalize_key


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[tuple[str, str]],
    how: str = "left",
    normalized: bool = True,
    broadcast_dim: bool = True,
    key_prefix: str = "_k_",
) -> DataFrame:
    """J1/J2: fact ⟕ dim on normalized text keys.

    ``keys`` is [(fact_col, dim_col), ...]; when ``normalized`` the join
    keys go through normalize_key (F1) on both sides, mirroring the
    reference's `normalizar_texto_chave` key prep
    (etl_pipeline.py:205-213). Helper key columns are dropped after the
    join (reference drops key_* at :215).
    """
    jkeys = []
    f, d = fact, dim
    for i, (fc, dc) in enumerate(keys):
        k = f"{key_prefix}{i}"
        fe = normalize_key(fc) if normalized else F.col(fc)
        de = normalize_key(dc) if normalized else F.col(dc)
        f = f.withColumn(k, fe)
        d = d.withColumn(k, de)
        jkeys.append(k)
    # project the dim to key + payload only (manual pushdown the
    # reference does at :211; Catalyst would prune anyway)
    d = d.drop(*[dc for _, dc in keys if dc not in jkeys])
    if broadcast_dim:
        d = F.broadcast(d)
    return f.join(d, on=jkeys, how=how).drop(*jkeys)


def unmatched_report(
    joined: DataFrame,
    value_col: str,
    example_cols: Sequence[str],
    n_examples: int = 5,
) -> DataFrame:
    """The reference's unmatched-join-key diagnostic
    (etl_pipeline.py:225-231): distinct examples of fact rows whose
    lookup failed. Returns a small DataFrame (caller may limit/collect)."""
    return (
        joined.filter(F.col(value_col).isNull())
        .select(*example_cols)
        .distinct()
        .limit(n_examples)
    )


def anti_join(df: DataFrame, other: DataFrame, keys: Sequence[str]) -> DataFrame:
    """J3: blacklist anti-join. The reference does `~isin(list)`
    (etl_pipeline.py:171-181); as a table-vs-table op this is Spark's
    left_anti (broadcast when `other` is small)."""
    return df.join(F.broadcast(other), on=list(keys), how="left_anti")
