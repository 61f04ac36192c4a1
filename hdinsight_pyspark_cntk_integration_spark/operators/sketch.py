"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark SQL since 3.5) — the incremental-analytics primitive the plain
``approx_count_distinct`` aggregate can't give you: a sketch is a VALUE
you can store per partition/day/shard and union later, so a 100 TB
corpus can maintain distinct-counts incrementally (sketch new data only,
``hll_union_agg`` with yesterday's sketches) instead of rescanning.

SURVEY.md §2.7 approximate-aggregate family. The sketch bytes are
engine-specific by construction, so the correctness gate checks the
ESTIMATE against the exact count with a quantified error bound (the
same bounded-assertion pattern as ``q_approx_distinct``), and pytest
pins the algebraic property that makes sketches useful: estimate(union
of per-group sketches) == estimate(sketch of the whole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per group: (group, sketch binary, estimate).
    lg_k=12 → 2^12 registers ≈ 1.6% relative standard error, 4 KB max
    per sketch — a day×shard matrix of these is megabytes, not a rescan.
    Partial aggregation applies: executors build per-partition sketches
    and the shuffle carries sketch bytes, not raw values."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    ).select(
        F.col(group_col),
        "sketch",
        F.hll_sketch_estimate("sketch").cast("double").alias("estimate"),
    )


def hll_union_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union a frame of sketches into one estimate — the roll-up step of
    incremental distinct counting (per-shard sketches → corpus total)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col), F.lit(True)))
        .cast("double")
        .alias("estimate")
    )


def distinct_bounded(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rel_tol: float = 0.05,
    lg_k: int = 12,
) -> DataFrame:
    """Gate-shaped query: per group, the EXACT distinct count plus a
    boolean asserting the HLL sketch estimate landed within ``rel_tol``
    relative error (lg_k=12 ⇒ rse≈1.6%, so 5% ≈ 3σ). The sketch value
    itself is engine-specific by design: it is checked, not emitted."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count_distinct(F.col(value_col)).cast("long").alias("exact_distinct"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
            ).alias("_approx"),
        )
        .select(
            F.col(group_col),
            "exact_distinct",
            (
                F.abs(
                    F.col("_approx").cast("double")
                    / F.col("exact_distinct").cast("double")
                    - 1.0
                )
                <= F.lit(float(rel_tol))
            ).alias("sketch_ok"),
        )
    )
