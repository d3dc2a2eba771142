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


def blocked_fuzzy_self_join(
    names: DataFrame, name_col: str, max_dist: int
) -> DataFrame:
    """Blocked fuzzy self-match over a NAME table (record-linkage /
    catalog-dedup primitive): candidate pairs must share ≥1 word
    (the blocking key), survivors verify with exact Levenshtein
    ≤ ``max_dist``. The two-phase shape every scalable fuzzy matcher
    uses — the all-pairs edit-distance join is quadratic and
    unshardable, while blocking turns it into an equi-join on the
    block key plus a verify bounded by candidate count.

    CONTRACT: ``names`` must already be DISTINCT on ``name_col``
    (dedupe first — fuzzy work should be ∝ distinct names, never
    rows; the caller keeps the per-name payload, e.g. counts).
    Blocking is standard RECALL-TRADEOFF machinery: a pair sharing no
    whole word is never compared (at word-level typo granularity
    that's the wanted behavior; for char-level blocking swap the key
    for char n-grams). At 100 TB the hot-block lever is the same
    df-cap/prefix-filter family as the shingle joins — a stopword
    block key pairs everything and should be dropped or prefixed.

    Returns (name_a, name_b, dist) with name_a < name_b, exact-integer
    ``dist`` (Spark's levenshtein == DuckDB's — both unit-cost DP)."""
    toks = names.select(
        F.col(name_col).alias("_n"),
        F.explode(F.split(F.col(name_col), " ")).alias("_k"),
    ).filter(F.col("_k") != "")
    a = toks.select(F.col("_n").alias("name_a"), "_k")
    b = toks.select(F.col("_n").alias("name_b"), "_k")
    cand = (
        a.join(b, "_k")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
