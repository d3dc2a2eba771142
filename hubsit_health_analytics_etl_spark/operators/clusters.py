"""Connected components over a pair list — duplicate-cluster
resolution for dedup pipelines.

MinHash/Jaccard emit PAIRS (a,b); a training-data pipeline needs
CLUSTERS ("keep one doc per duplicate group"), i.e. connected
components of the pair graph. Implemented as iterative minimum-label
propagation on DataFrames: each node adopts the smallest id reachable
in one hop; converges in O(diameter) ≤ O(log n) iterations for the
short chains dedup graphs produce.

Iterative (driver-side loop over lazy plans) → not expressible as one
SQL query, so the workload registration is rows-only; correctness is
pinned by unit tests on crafted graphs. At scale: each iteration is a
self-join + groupBy min on (node, label) — shuffle on node ids; use
checkpointing every few iterations to truncate lineage (done here via
localCheckpoint when available).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id of its connected component."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    # materialize once: every iteration joins edges — without this the
    # upstream pair-generation pipeline (e.g. the full MinHash LSH) is
    # re-executed per iteration
    try:
        edges = edges.localCheckpoint(eager=True)
    except Exception:
        edges = edges.cache()
    # label starts as min neighbor (including self)
    labels = (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .select(F.col("u").alias("node"), F.least(F.col("comp"), F.col("node")).alias("comp"))
    )
    for _ in range(max_iter):
        # propagate: node takes min(own comp, neighbors' comps)
        neighbor_comp = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_comp.withColumnRenamed("u", "node"), "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        try:
            new_labels = new_labels.localCheckpoint(eager=True)
        except Exception:
            new_labels = new_labels.cache()
        changed = (
            labels.withColumnRenamed("comp", "old")
            .join(new_labels, "node")
            .filter(F.col("old") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silent non-convergence would split one duplicate group into
        # several keepers with no signal — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"(graph diameter exceeds max_iter — raise it)"
        )
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster summary: one row per duplicate group (component id =
    keeper = min doc id, member count). Singleton docs (no dup edges)
    are their own keeper."""
    comps = connected_components(pairs, src, dst)
    joined = docs.select(F.col(id_col).alias("node")).join(comps, "node", "left")
    resolved = joined.select(
        F.col("node").alias(id_col),
        F.coalesce(F.col("component"), F.col("node")).alias("component"),
    )
    return resolved.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("keeper"),
    )
