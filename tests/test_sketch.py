"""DataSketches HLL operators: the mergeability algebra that makes
sketches worth storing (union of partial sketches == sketch of the
whole), plus the bounded-error gate shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdinsight_pyspark_cntk_integration_spark.operators.sketch import (
    distinct_bounded,
    hll_sketch_by_group,
    hll_union_estimate,
)
from hdinsight_pyspark_cntk_integration_spark.sources.catalog import load_table


def test_hll_union_of_group_sketches_equals_whole(spark, sf_dir):
    """estimate(union(per-group sketches)) == estimate(one sketch over
    everything): the incremental-maintenance property. HLL register
    merge is exact (max per register), so the two are EQUAL, not just
    close."""
    ev = load_table(spark, sf_dir, "events")
    per_group = hll_sketch_by_group(ev, "event_type", "user_id", lg_k=12)
    unioned = hll_union_estimate(per_group).collect()[0]["estimate"]
    whole = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("e")
        ).collect()[0]["e"]
    )
    assert unioned == whole


def test_hll_estimate_within_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = distinct_bounded(ev, "event_type", "user_id", rel_tol=0.05).collect()
    assert rows, "expected at least one event_type group"
    for r in rows:
        assert r["sketch_ok"], (r["event_type"], r["exact_distinct"])
        assert r["exact_distinct"] > 0


def test_hll_sketch_insensitive_to_partitioning(spark, sf_dir):
    """Sketch estimates are deterministic under repartitioning — register
    merge is commutative/associative, so the physical plan can't change
    the answer."""
    ev = load_table(spark, sf_dir, "events")
    a = hll_sketch_by_group(ev, "event_type", "user_id").select("event_type", "estimate")
    b = hll_sketch_by_group(ev.repartition(13, "user_id"), "event_type", "user_id").select(
        "event_type", "estimate"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_heavy_hitters_exact_guarantee_and_partition_invariance(spark):
    """Planted zipf-ish skew: every value above the n/capacity support
    must be reported with its exact count, none below it, and the output
    must not depend on partitioning (1 vs 17 partitions) even though the
    MG candidate superset does."""
    from collections import Counter

    from hdinsight_pyspark_cntk_integration_spark.operators.sketch import heavy_hitters_exact

    vals = []
    for v in range(40):
        vals.extend([v] * (3 + (200 if v < 3 else v)))  # 3 hot values
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "row_id long, v long")
    exact = Counter(vals)
    n = len(vals)
    cap = 10
    want = {v: c for v, c in exact.items() if c * cap > n}
    assert 1 <= len(want) < len(exact)

    for parts in (1, 17):
        out = heavy_hitters_exact(df.repartition(parts), "v", capacity=cap)
        got = {r["v"]: r["n_occurrences"] for r in out.collect()}
        assert got == want, parts
