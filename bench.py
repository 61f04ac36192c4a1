"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop sink (full computation, no driver
collect), mirroring how a production job would terminate in a write.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from hdinsight_pyspark_cntk_integration_spark import get_spark

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "window_topn",
    "asof_join",
    "tumbling_hourly",
    "json_extract",
    "dedup_exact",
    "token_stats",
    "similarity_topk",
    "score_confusion",
    "minhash_near_dup",
]


N_BENCH_IMAGES = 10_000  # the reference's benchmark cardinality (README.md:194)


def inference_throughput(spark) -> float:
    """Reference-comparable inference bench: score 10k synthetic 3072-dim
    'images' (deterministic JVM-generated values) through the mapInPandas
    scorer with the full P1-P5 preprocessing chain + linear stub model.
    Baseline to beat: ≈102.2 images/s (BASELINE.md)."""
    import numpy as np
    from pyspark.sql import functions as F

    from hdinsight_pyspark_cntk_integration_spark.operators import scoring as sc

    par = spark.sparkContext.defaultParallelism
    images = (
        spark.range(N_BENCH_IMAGES)
        .repartition(par)
        .select(
            F.col("id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(3071)),
                lambda i: F.pmod(F.col("id") * 3072 + i.cast("long") * 2654435761, F.lit(256)).cast("float"),
            ).alias("image"),
        )
    )
    mean = np.zeros((3, 32, 32), dtype=np.float32)
    scored = sc.score(
        images,
        sc.make_linear_stub_loader(3072, 10),
        input_col="image",
        pass_through=["id"],
        preprocess=lambda b: sc.cifar_preprocess(b, mean),
    )
    scored.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):  # best-of-3: single runs swing ±40% on GC pauses
        t0 = time.perf_counter()
        scored.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return N_BENCH_IMAGES / best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # JVM/codegen + Python-worker-pool warmup on trivial actions so
    # per-query numbers measure the plan, not first-call initialization
    # (workers are reused across jobs; starting one per core is a fixed
    # ~2s cost that would otherwise land on the first pandas-UDF query).
    spark.range(1000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism

    def _noop(batches):
        yield from batches

    spark.range(par).repartition(par).mapInPandas(_noop, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        # one unmeasured run per query (first-touch parquet footer reads,
        # codegen compilation), then measure the steady-state execution —
        # the number that scales with data, not with JVM warmup.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    images_per_sec = inference_throughput(spark)

    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "images_per_sec": round(images_per_sec, 1),
                "reference_images_per_sec": 102.2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
