"""Benchmark harness: runs every workload query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query execution via ``df.write.format("noop")``: the
noop sink consumes every InternalRow JVM-side, so every projected
expression (md5/sha2/window/...) is actually evaluated.  A bare
``count()`` is NOT a valid terminal action here — Catalyst prunes
unused projections under count(), so map-only queries (simhash_docs,
pseudonymize_customers, rolling_7d_revenue) would time a bare scan.

``SPARK_GRAFT_WARM_RUNS=N`` (default 0) repeats the full loop N extra
times and reports the LAST pass — steady-state numbers with codegen
compiled and broadcasts warm, for the cold-vs-warm grid in
BASELINE.md. The driver's contract (one JSON line, same fields) is
unchanged; warm mode adds a "warm_runs" field.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hubsit_health_analytics_etl_spark.session import get_spark
    from hubsit_health_analytics_etl_spark.workload import QUERIES

    spark = get_spark(app_name="hubsit-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # The sf0.1 fixtures are single-digit-MB parquet files: at the
    # default 128m split size every scan lands on 1-3 tasks and the
    # per-row compute (regex normalization, md5 shingles) serializes.
    # 8m splits fan the local files across cores; production sessions
    # keep the default (at 100 TB the source has thousands of splits).
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    # warm the JVM + parquet footers + Python workers once (excluded
    # from timings — steady-state throughput is what's measured)
    QUERIES["daily_status"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    warm_runs = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "0"))
    timings: dict[str, float] = {}
    for _ in range(warm_runs + 1):
        timings = {}
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
    total = round(sum(timings.values()), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "workload_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if warm_runs:
        payload["warm_runs"] = warm_runs
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
