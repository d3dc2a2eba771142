"""Training-data export with integrity manifests.

The last step of every curation pipeline is a dump a TRAINER reads —
and the first question after a bad run is "did the trainer read
exactly what the pipeline wrote?". This module writes hash-sharded
parquet plus a per-shard manifest (row count + order-independent
content fingerprint) and re-verifies a dump against its manifest
without re-reading the pipeline.

Fingerprint = SUM over rows of the first-8-hex md5 of the row's JSON
serialization (struct field order fixed by the schema): commutative,
so it is partition- and order-independent — two honest reads always
agree. Detection scope (honest-failure, NOT adversarial): any SINGLE
dropped, duplicated, or altered row changes the sum, and independent
random corruption escapes with probability ~2^-32 per shard; a
deliberately compensating multi-row edit (or a drop+inject pair whose
truncated-hash deltas cancel) passes verification — use md5 over the
sorted row hashes if tamper-evidence is required. The int64 SUM wraps
(mod 2^64) past ~2^31 rows/shard; this engine runs non-ANSI, where
the silent wrap IS a valid commutative fingerprint — under
spark.sql.ansi.enabled the overflow would throw instead, so cap shard
sizes or wrap the hash term in pmod there. The same map-side
md5-integer trick as operators/sampling.py; at 100 TB the fingerprint
pass is one map + one per-shard partial sum riding the export
shuffle.

Retry/speculation posture (ADVICE r17): the manifest stats ride the
write as Observation metrics — accumulator-backed, and Spark counts
an accumulator update once per SUCCESSFUL task, discarding failed
attempts, so a retried write task does not double-count (pinned by
tests/test_export_manifest.py::
test_manifest_observation_exact_under_task_retry, a local[4,2]
fault-injection drill). Should a runtime ever drift here,
``verify_export``'s independent re-read of the dump is the backstop:
a double-counted manifest fails verification loudly instead of
shipping.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_manifest.json"


def _fingerprint_cols(df: DataFrame, shard_col: str) -> DataFrame:
    cols = [c for c in df.columns if c != shard_col]
    row_fp = F.expr(
        "cast(conv(substr(md5(to_json(struct("
        + ", ".join(cols)
        + "))), 1, 8), 16, 10) as bigint)"
    )
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_fp).alias("content_fp"),
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    salt: str = "shard",
) -> dict:
    """Write ``df`` into ``n_shards`` deterministic hash shards
    (partitioned parquet) plus ``_manifest.json``; returns the
    manifest dict. Shard membership is a pure function of the key —
    the same contract as training_shard_plan."""
    shard = F.expr(
        f"cast(conv(substr(md5(concat('{salt}', cast({key} as string))), 1, 8),"
        f" 16, 10) as bigint) % {n_shards}"
    )
    sharded = df.withColumn("_shard", shard)

    # Per-shard manifest stats ride the WRITE itself as Observation
    # metrics instead of a second full execution of the (often deep —
    # the lifecycle splices) input lineage: the previous
    # _fingerprint_cols(...).collect() re-ran every upstream join and
    # broadcast build a second time per export. The metrics are
    # computed from the same pre-write rows (CollectMetrics sits under
    # the writer), so the manifest still records what the pipeline
    # MEANT to write and verify_export still independently re-reads
    # the dump — the integrity contract is unchanged. _fp/_shard are
    # projected once per row below the metrics node (n_shards
    # conditional sums over a precomputed column, not n_shards md5
    # evaluations) and dropped before the writer sees them.
    from pyspark.sql import Observation

    cols = [c for c in df.columns if c != "_shard"]
    row_fp = F.expr(
        "cast(conv(substr(md5(to_json(struct("
        + ", ".join(cols)
        + "))), 1, 8), 16, 10) as bigint)"
    )
    obs = Observation()
    aggs = []
    for i in range(n_shards):
        hit = F.col("_shard") == i
        aggs.append(F.sum(hit.cast("long")).alias(f"n_{i}"))
        aggs.append(F.sum(F.when(hit, F.col("_fp"))).alias(f"fp_{i}"))
    (
        sharded.withColumn("_fp", row_fp)
        .observe(obs, *aggs)
        .drop("_fp")
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(path)
    )
    vals = obs.get
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "salt": salt,
        # the dump's schema rides the manifest so a re-read never
        # depends on footer inference — in particular an EMPTY dump
        # (a filter chain that selected nothing writes zero parquet
        # files) still reads back as an empty frame instead of
        # UNABLE_TO_INFER_SCHEMA (found by bench_scale.py r13)
        "schema": sharded.schema.json(),
        "shards": {
            str(i): {
                "n_rows": int(vals[f"n_{i}"]),
                "content_fp": int(vals[f"fp_{i}"]),
            }
            for i in range(n_shards)
            if vals[f"n_{i}"]
        },
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_export(
    spark: SparkSession, path: str, manifest: "dict | None" = None
) -> DataFrame:
    """Read a dump under its manifest-recorded schema (explicit
    schema = no footer inference, and an empty dump — zero data files
    — reads back as an empty frame with the right columns). Falls back
    to inference for manifests written before the schema field."""
    if manifest is None:
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            manifest = json.load(f)
    if "schema" in manifest:
        from pyspark.sql.types import StructType

        return spark.read.schema(
            StructType.fromJson(json.loads(manifest["schema"]))
        ).parquet(path)
    return spark.read.parquet(path)


def verify_export(spark: SparkSession, path: str) -> list[str]:
    """Re-read a dump and compare against its manifest. Returns the
    list of problems (empty = verified); never raises on mismatch so
    an ingest gate can report all failures at once."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    df = read_export(spark, path, manifest)
    got = {
        str(r["_shard"]): (r["n_rows"], r["content_fp"])
        for r in _fingerprint_cols(df, "_shard").collect()
    }
    problems = []
    for shard, exp in sorted(manifest["shards"].items()):
        if shard not in got:
            problems.append(f"shard {shard}: missing from dump")
            continue
        n, fp = got[shard]
        if n != exp["n_rows"]:
            problems.append(
                f"shard {shard}: n_rows {n} != manifest {exp['n_rows']}"
            )
        elif fp != exp["content_fp"]:
            problems.append(f"shard {shard}: content fingerprint mismatch")
    for shard in sorted(set(got) - set(manifest["shards"])):
        problems.append(f"shard {shard}: not in manifest")
    return problems
