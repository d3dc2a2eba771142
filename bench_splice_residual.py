"""Splice-residual cost model (VERDICT r16 #4): measure the FIXED
500-doc-batch dataset splice against 1x/100x/300x standing corpora
and record, next to each wall clock, the BYTES of the standing-index
tables the splice scans — turning the r16 attribution ("the residual
is single-pass scan IO over the probed standing indexes") into a
stated cost model: splice_secs ≈ base + rate × probed_gigabytes,
with the rate the box's effective parallel scan throughput.

Why bytes and not rows: the r16 per-stage attribution showed every
corpus-∝ SHUFFLE is gone from the splice; what remains corpus-∝ is
one parallel SCAN per probed index per ingest (md5-keyed probes
cannot file-prune under stats/bloom layouts — uniform keys overlap
every file's min/max). At 100 TB that term is bounded by aggregate
scan bandwidth, so the honest model is bytes-per-ingest, which this
harness measures directly instead of inferring from fixture seconds.

Usage:
    python bench_splice_residual.py          # mults 1,100,300
    SPARK_GRAFT_RESIDUAL_MULTS=1,100 python bench_splice_residual.py

Reuses bench_scale.py's synthetic corpora (same generator, same
distribution at every multiplier) and its `lifecycle_fixed_batch`
probe body. Output: ONE JSON line on stdout + the grid at
bench_evidence/r17_splice_residual_bytes_model.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import bench_scale  # noqa: E402  (corpus generator + splice probe)


def _dir_bytes(d: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> int:
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.session import get_spark
    from hubsit_health_analytics_etl_spark.sources.parquet import load_table
    from hubsit_health_analytics_etl_spark.workloads.w18_dataset_increment import (
        _build_llm_standing,
        _scrub_splice,
        _splice_selection,
    )

    spark = get_spark(app_name="splice-residual-model")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    root = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join("/tmp", "hubsit_scale_corpora"),
    )
    mults = [
        int(m)
        for m in os.environ.get(
            "SPARK_GRAFT_RESIDUAL_MULTS", "1,100,300"
        ).split(",")
    ]
    points = []
    for mult in mults:
        tag = "base" if mult == 1 else f"x{mult}"
        d = os.path.join(root, tag)
        marker = os.path.join(d, "_complete_v3")
        if not os.path.exists(marker):
            import shutil

            shutil.rmtree(d, ignore_errors=True)
            bench_scale.gen_corpus(
                spark,
                d,
                bench_scale.BASE_DOCS * mult,
                bench_scale.BASE_EVENTS * mult,
                bench_scale.BASE_VECS * mult,
                bench_scale.BASE_USERS * mult,
                bench_scale.BASE_ORDERS * mult,
            )
            open(marker, "w").close()

        docs = load_table(spark, d, "documents")
        is_batch = F.col("doc_id") < bench_scale.FIXED_BATCH_DOCS
        paths = _build_llm_standing(
            spark, d, ~is_batch, f"residual_{tag}"
        )
        standing_bytes = {k: _dir_bytes(p) for k, p in paths.items()}
        batch = docs.filter(is_batch)
        rd = spark.read.parquet

        t0 = time.perf_counter()
        dlt: dict = {}
        sel_new = _splice_selection(spark, docs, paths, batch, delta=dlt)
        skept_new, dwc_new, changed, _ = _scrub_splice(
            spark, docs, paths, rd(paths["sel"]), sel_new, delta=dlt
        )
        n_changed = changed.count()
        skept_new.write.format("noop").mode("overwrite").save()
        dwc_new.write.format("noop").mode("overwrite").save()
        splice_secs = round(time.perf_counter() - t0, 3)

        gb = round(sum(standing_bytes.values()) / 1e9, 4)
        points.append(
            {
                "mult": mult,
                "n_docs": bench_scale.BASE_DOCS * mult,
                "splice_secs": splice_secs,
                "n_changed_docs": n_changed,
                "standing_index_gb": gb,
                "standing_bytes_by_member": standing_bytes,
            }
        )
        print(f"[{tag}] {json.dumps(points[-1]['splice_secs'])}s "
              f"{gb}GB changed={n_changed}", file=sys.stderr)

    # least-squares fit splice_secs = base + rate * GB over the points
    xs = [p["standing_index_gb"] for p in points]
    ys = [p["splice_secs"] for p in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs) or 1e-12
    rate = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    base = my - rate * mx
    out = {
        "metric": "splice_residual_bytes_model",
        "points": points,
        "model": {
            "base_secs": round(base, 3),
            "secs_per_standing_gb": round(rate, 3),
        },
        "note": (
            "fixed 500-doc batch; standing fixture untimed; residual "
            "grows with probed standing-index bytes (single-pass scan "
            "IO, parallelizes across executors at cluster scale)"
        ),
    }
    path = os.path.join(
        HERE, "bench_evidence", "r17_splice_residual_bytes_model.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": out["metric"],
        "splice_secs": ys,
        "standing_gb": xs,
        "model": out["model"],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
