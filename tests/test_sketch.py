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
