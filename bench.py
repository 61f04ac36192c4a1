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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # JVM/codegen warmup on a trivial action so per-query numbers measure
    # the plan, not first-call initialization.
    spark.range(1000).selectExpr("sum(id)").collect()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
