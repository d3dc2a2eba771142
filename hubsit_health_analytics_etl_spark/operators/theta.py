"""Theta/KMV sketch: mergeable distinct-count summaries that support
the set operations HLL cannot — INTERSECTION and DIFFERENCE.

The HLL index (operators/aggregate.py::hll_sketch_index) answers
"how many distinct X per group" and merges by register-max, but HLL
registers carry no membership information: there is no HLL
intersection (inclusion-exclusion explodes its error) and no A-not-B.
The KMV ("k minimum values") / theta sketch keeps the k SMALLEST
md5 hashes of the distinct values — a fixed-size uniform sample of
the hash space — so besides union-merge (bottom-k of the combined
samples IS the bottom-k of the union, exactly) it supports:

- ``intersection``: hashes below theta_AB = min(theta_A, theta_B) are
  a uniform sample of BOTH sets' hash space; counting those present
  in both samples estimates |A ∩ B| (Dasgupta et al., "Theta-Sketch
  Framework", and the Apache DataSketches theta family).
- ``A-not-B``: same window, membership test against B's sample —
  estimates |A \\ B| (the sketch-level "how much would forgetting B
  remove" answer; EXACT forget of a theta index is rebuild-from-kept,
  the same documented contract as hll_forget_rebuild).

Engine-portable determinism: hashes are the repo's md5-integer
convention widened to 60 bits (15 hex chars — exact in BIGINT on both
engines), so the DuckDB oracle rebuilds the IDENTICAL sketch and every
estimate compares exact-integer. Estimates use the unbiased KMV
estimator floor((k-1)·M/theta) computed in double — (k-1)·M is exact
in double (k ≤ 2^10, M = 2^60), and both engines perform the same
single IEEE division + floor.

Scale posture (100 TB): the standing index is ONE ROW PER GROUP with a
≤k-element array — set algebra over indexes (merge / intersect /
diff / rollup) touches only k-sized arrays, never the data. The BUILD
is the only pass over raw rows; by default it pre-filters map-side
with a native-HLL cardinality probe (approx_count_distinct: bounded
partial state) so the build shuffle carries ~margin·k hashes per
group instead of the full distinct key space. The final sketch is
threshold-INVARIANT (bottom-k survives any filter that keeps ≥ k
hashes); the margin is Chernoff-generous and the oracle would catch an
over-aggressive drop as a hash mismatch.

Reference scope: the pandas reference has no sketching
(/root/reference/src/etl_pipeline.py ``value_counts()``s 60k-row
frames); this extends the beyond-reference sketch surface (CMS grid,
HLL index, mergeable quantile histogram, moments triples) with the
set-algebra member.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

THETA_K = 32
# 60-bit hash space: 15 hex chars of md5 — exact in int64 AND in
# double-precision (2^60 < 2^63, and 2^60 is a power of two).
THETA_M = 1 << 60
# build pre-filter keeps ~margin·k expected hashes per group; 8× is
# Chernoff-generous (P[<k survivors] < e^{-k} for margin 8).
PREFILTER_MARGIN = 8


def theta_hash_sql(col: str, salt: str = "theta") -> str:
    """Spark SQL text for the 60-bit value hash (column name or SQL
    expression) — text-built so the DuckDB twin stays byte-comparable."""
    return (
        f"cast(conv(substr(md5(concat('{salt}', cast({col} as string))), 1, 15), "
        f"16, 10) as bigint)"
    )


def duckdb_theta_hash_sql(col: str, salt: str = "theta") -> str:
    """DuckDB twin of theta_hash_sql (identical md5 input bytes)."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 15) "
        f"AS BIGINT)"
    )


def theta_sketch(
    df: DataFrame,
    groups: "list[str]",
    col: str,
    k: int = THETA_K,
    prefilter: "bool | str" = "auto",
) -> DataFrame:
    """Per-group KMV sketch: one row per group with ``hs`` = the sorted
    bottom-k distinct 60-bit hashes of ``col``.

    ``prefilter`` (the build's scale lever):
    - ``"auto"`` (default): one bounded-state pass of native
      ``approx_count_distinct`` per group sizes a per-group hash
      threshold M·(margin·k/est); the map-side ``h < t`` filter then
      caps the build shuffle at ~margin·k hashes per group. Groups at
      or below margin·k cardinality keep everything (t = M).
    - ``False``: skip the probe (small/enum group domains where the
      full distinct shuffle is already tiny).
    The sketch CONTENT is threshold-invariant — bottom-k is unchanged
    by any filter keeping ≥ k hashes — so the estimator downstream
    (and the DuckDB oracle, which builds without a threshold) agrees
    exactly regardless of the lever's setting.
    """
    h = F.expr(theta_hash_sql(col)).alias("h")
    hashed = df.select(*[F.col(g) for g in groups], h)
    if prefilter == "auto" or prefilter is True:
        est = df.groupBy(*groups).agg(
            F.approx_count_distinct(col).alias("_est")
        )
        thresh = est.select(
            *groups,
            F.when(
                F.col("_est") > PREFILTER_MARGIN * k,
                (
                    F.lit(float(THETA_M))
                    * (F.lit(float(PREFILTER_MARGIN * k)) / F.col("_est"))
                ).cast("bigint"),
            )
            .otherwise(F.lit(THETA_M))
            .alias("_t"),
        )
        # no explicit broadcast hint: the threshold table is |groups|
        # rows — AQE broadcasts it when small and falls back to a
        # shuffle join at extreme group cardinality (the grouped-CMS
        # ADVICE r12 lesson: never force a broadcast whose size is an
        # unbounded function of the data)
        hashed = (
            hashed.join(thresh, groups)
            .filter(F.col("h") < F.col("_t"))
            .select(*groups, "h")
        )
    return (
        hashed.groupBy(*groups)
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))
    )


def _theta_of(hs: str, k: int) -> str:
    """SQL text: the sketch's theta — the k-th smallest hash when
    saturated, else M (every distinct hash is present: the sketch IS
    the exact set)."""
    return (
        f"case when size({hs}) >= {k} then element_at({hs}, {k}) "
        f"else cast({THETA_M} as bigint) end"
    )


def theta_estimate(
    sketch: DataFrame, k: int = THETA_K, out: str = "est_distinct"
) -> DataFrame:
    """Distinct-count estimate per group: exact size when unsaturated,
    else the unbiased KMV estimator floor((k-1)·M/theta) — exactly
    k-1 sample hashes lie strictly below theta."""
    theta = _theta_of("hs", k)
    return sketch.withColumn(
        out,
        F.expr(
            f"case when size(hs) < {k} then cast(size(hs) as bigint) "
            f"else cast(floor((cast({k - 1} as double) * cast({THETA_M} as double))"
            f" / cast({theta} as double)) as bigint) end"
        ),
    )


def theta_union(a: DataFrame, b: DataFrame, groups: "list[str]", k: int = THETA_K) -> DataFrame:
    """Union-merge two per-group sketch tables (full outer on groups —
    a group absent from one side keeps the other's sketch): bottom-k of
    the deduplicated concatenation. EXACT merge law: every one of the
    k smallest hashes of A ∪ B is among the k smallest of whichever
    side contains it, so merged == built-from-scratch — the additive
    property every standing index in this repo certifies."""
    aa = a.select(*groups, F.col("hs").alias("_ha"))
    bb = b.select(*groups, F.col("hs").alias("_hb"))
    return (
        aa.join(bb, groups, "full_outer")
        .select(
            *groups,
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce(F.col("_ha"), F.expr("cast(array() as array<bigint>)")),
                            F.coalesce(F.col("_hb"), F.expr("cast(array() as array<bigint>)")),
                        )
                    )
                ),
                1,
                k,
            ).alias("hs"),
        )
    )


def theta_rollup(
    sketch: DataFrame, to_groups: "list[str]", k: int = THETA_K
) -> DataFrame:
    """Merge fine-grained group sketches up to a coarser grouping
    (e.g. monthly → yearly) WITHOUT re-scanning data: flatten + dedup
    + re-slice. Same exact merge law as theta_union."""
    return (
        sketch.groupBy(*to_groups)
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("hs")))),
                1,
                k,
            ).alias("hs")
        )
    )


def theta_set_ops(
    a: DataFrame,
    b: DataFrame,
    join_on,
    k: int = THETA_K,
    prefix_a: str = "a",
    prefix_b: str = "b",
) -> DataFrame:
    """Pairwise intersection + A-not-B estimates between two sketch
    tables.

    ``join_on``: either a list of shared group columns (equi-pairing)
    or a Column join condition over ``a_*``/``b_*``-prefixed group
    columns (e.g. consecutive-month pairing). Output keeps both sides'
    group columns prefixed, plus:

    - ``est_intersect``: floor(|{h ∈ A∩B sample, h < θ_AB}|·M/θ_AB)
    - ``est_a_not_b``:  floor(|{h ∈ A sample, h < θ_AB, h ∉ B}|·M/θ_AB)

    with θ_AB = min(θ_A, θ_B) — the classic theta-framework windowed
    estimators. Both reduce to EXACT set counts when both sketches are
    unsaturated (θ_AB = M keeps every hash)."""
    ga = [c for c in a.columns if c != "hs"]
    gb = [c for c in b.columns if c != "hs"]
    aa = a.select(
        *[F.col(c).alias(f"{prefix_a}_{c}") for c in ga], F.col("hs").alias("_ha")
    )
    bb = b.select(
        *[F.col(c).alias(f"{prefix_b}_{c}") for c in gb], F.col("hs").alias("_hb")
    )
    if isinstance(join_on, list):
        cond = None
        for c in join_on:
            eq = F.col(f"{prefix_a}_{c}") == F.col(f"{prefix_b}_{c}")
            cond = eq if cond is None else (cond & eq)
    else:
        cond = join_on
    theta_a = _theta_of("_ha", k)
    theta_b = _theta_of("_hb", k)
    return (
        aa.join(bb, cond)
        .withColumn("_theta", F.expr(f"least({theta_a}, {theta_b})"))
        .withColumn(
            "_n_and",
            F.expr("size(filter(array_intersect(_ha, _hb), x -> x < _theta))"),
        )
        .withColumn(
            "_n_anb",
            F.expr(
                "size(filter(_ha, x -> x < _theta and not array_contains(_hb, x)))"
            ),
        )
        .withColumn(
            "est_intersect",
            F.expr(
                f"cast(floor((cast(_n_and as double) * cast({THETA_M} as double))"
                f" / cast(_theta as double)) as bigint)"
            ),
        )
        .withColumn(
            "est_a_not_b",
            F.expr(
                f"cast(floor((cast(_n_anb as double) * cast({THETA_M} as double))"
                f" / cast(_theta as double)) as bigint)"
            ),
        )
        .drop("_ha", "_hb", "_theta", "_n_and", "_n_anb")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders — the byte-comparable twins. The oracle builds
# UNFILTERED (exact bottom-k over all distinct hashes): the Spark
# prefilter is content-invariant, so the arrays agree exactly.
# ---------------------------------------------------------------------------


def duckdb_theta_sketch_sql(
    src: str, group_expr: str, group_alias: str, col: str, k: int = THETA_K
) -> str:
    """CTE body: per-group sorted bottom-k distinct hashes as a list
    column ``hs`` (group column aliased ``group_alias``)."""
    h = duckdb_theta_hash_sql(col)
    return f"""
    SELECT {group_alias}, list(h ORDER BY h) AS hs FROM (
      SELECT {group_alias}, h, ROW_NUMBER() OVER (
               PARTITION BY {group_alias} ORDER BY h) AS _rk
      FROM (SELECT DISTINCT {group_expr} AS {group_alias}, {h} AS h FROM {src})
    ) WHERE _rk <= {k} GROUP BY {group_alias}
    """


def duckdb_theta_of(hs: str, k: int = THETA_K) -> str:
    return (
        f"(CASE WHEN len({hs}) >= {k} THEN {hs}[{k}] "
        f"ELSE CAST({THETA_M} AS BIGINT) END)"
    )


def duckdb_theta_estimate(hs: str, k: int = THETA_K) -> str:
    theta = duckdb_theta_of(hs, k)
    return (
        f"(CASE WHEN len({hs}) < {k} THEN len({hs})::BIGINT "
        f"ELSE CAST(floor((CAST({k - 1} AS DOUBLE) * CAST({THETA_M} AS DOUBLE))"
        f" / CAST({theta} AS DOUBLE)) AS BIGINT) END)"
    )
