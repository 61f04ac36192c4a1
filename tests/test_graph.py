"""Integer PageRank + degree stats: hand-replicated integer arithmetic
on tiny graphs (the same micro-unit floor-division pipeline, in Python
ints), invariants, and error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdinsight_pyspark_cntk_integration_spark.operators import graph as gr


def _py_pagerank(edges, iters=3, damping_ppm=850_000):
    """Reference implementation in exact Python integers."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        s_in = {n: 0 for n in nodes}
        for s, d, w in edges:
            s_in[d] += (r[s] * w) // out_w[s]
        r = {n: (1_000_000 - damping_ppm) + (damping_ppm * s_in[n]) // 1_000_000 for n in nodes}
    return r


def test_pagerank_matches_python_integers(spark):
    edges = [(0, 1, 2), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    df = spark.createDataFrame(edges, "src int, dst int, weight long")
    got = {r["node"]: r["rank_micro"] for r in gr.pagerank_integer(df, iters=3).collect()}
    assert got == _py_pagerank(edges, iters=3)
    # the hub node 0 (receives everything) outranks the leaves
    assert got[0] > got[1] > got[2]


def test_pagerank_uniform_cycle_is_stationary(spark):
    """A uniform cycle is the PageRank fixpoint: ranks stay exactly 1e6
    (the floor divisions are exact), for any sweep count."""
    df = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 5), (2, 0, 5)], "src int, dst int, weight long"
    )
    for iters in (1, 4):
        got = {r["node"]: r["rank_micro"] for r in gr.pagerank_integer(df, iters=iters).collect()}
        assert got == {0: 1_000_000, 1: 1_000_000, 2: 1_000_000}


def test_pagerank_sink_node_gets_base_plus_inflow(spark):
    """A pure sink (no out-edges) accumulates inflow; a pure source ends
    at the teleport base. Mass leak from the sink is the documented
    no-redistribution contract."""
    edges = [(0, 1, 1)]
    df = spark.createDataFrame(edges, "src int, dst int, weight long")
    got = {r["node"]: r["rank_micro"] for r in gr.pagerank_integer(df, iters=2).collect()}
    assert got == _py_pagerank(edges, iters=2)
    assert got[0] == 150_000  # no inflow after sweep 1: teleport base only


def test_pagerank_validations(spark):
    df = spark.createDataFrame([(0, 1, 1)], "src int, dst int, weight long")
    with pytest.raises(ValueError, match="iters"):
        gr.pagerank_integer(df, iters=0)
    with pytest.raises(ValueError, match="damping_ppm"):
        gr.pagerank_integer(df, damping_ppm=2_000_000)


def test_degree_stats(spark):
    df = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (1, 2, 1)], "src int, dst int, weight long"
    )
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in gr.degree_stats(df).collect()}
    assert got == {0: (2, 0), 1: (1, 1), 2: (0, 2)}
