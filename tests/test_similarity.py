"""Similarity search: brute-force vs NumPy ground truth, IVF recall."""

from __future__ import annotations

import numpy as np
import pytest

from hdinsight_pyspark_cntk_integration_spark.operators import similarity as sim
from hdinsight_pyspark_cntk_integration_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    return pdf["vec_id"].to_numpy(), np.stack(pdf["embedding"].to_numpy()).astype(np.float64)


def _numpy_topk(ids, mat, qid, k=10):
    q = mat[ids == qid][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, ids), key=lambda t: (t[0], t[1]))
    return [int(i) for s, i in order if i != qid][:k]


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    queries = sim.self_queries(emb, [0, 5])
    out = sim.cosine_topk(emb, queries, k=10).toPandas()
    for qid in (0, 5):
        got = out[out["query_id"] == qid].sort_values("score", ascending=False)
        assert list(got["vec_id"]) == _numpy_topk(ids, mat, qid)


def test_cosine_topk_returns_k_rows_per_query(spark, emb):
    queries = sim.self_queries(emb, [1, 2, 3])
    out = sim.cosine_topk(emb, queries, k=7).groupBy("query_id").count().collect()
    assert {r["count"] for r in out} == {7}


def test_ivf_recall_vs_bruteforce(spark, emb, emb_np):
    ids, mat = emb_np
    centroids = sim.grid_centroids(emb, 8)
    queries = sim.self_queries(emb, [0])
    approx = sim.ivf_topk(emb, queries, centroids, k=10, nprobe=4).toPandas()
    exact = set(_numpy_topk(ids, mat, 0, k=10))
    got = set(approx["vec_id"].astype(int))
    # approximate: require >=40% recall with 4/8 cells probed
    assert len(got & exact) >= 4
