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

    # warm the JVM + parquet footers + Python workers once (excluded
    # from timings — steady-state throughput is what's measured)
    QUERIES["daily_status"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(sum(timings.values()), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "workload_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
