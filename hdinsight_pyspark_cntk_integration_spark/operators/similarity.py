"""Similarity search over embedding columns (SURVEY.md §2.7 addition).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
(dedup.embedding_near_dup_candidates) and the IVF variant here are the
scale paths. All distance math is JVM-side (functions.vector) — the
pandas-UDF path is reserved for true matrix workloads (operators.scoring).

Scale design: queries are broadcast (they're small); the corpus is never
shuffled for brute force — each partition scores its rows against every
query, then a bounded per-query top-k aggregation combines map-side, so
the shuffle is O(num_queries × k), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdinsight_pyspark_cntk_integration_spark.functions.vector import cosine_similarity, dot, l2_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Plan: broadcast-nested-loop join (queries are tiny) → per-row cosine
    (codegen) → top-k per query via sorted-struct aggregation. The agg
    does map-side partial combines of at most k structs per query per
    partition, so no full sort and no large shuffle — O(Q×k) rows move.

    Ties broken by smaller corpus id for determinism.
    Returns (query_id, vec_id, score) with k rows per query.
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(corpus_vec, query_vec).alias("score"),
    )
    if not include_self:
        scored = scored.filter(F.col(corpus_id) != F.col(query_id))
    # struct sorts lexicographically: (-score, id) ascending == score desc, id asc
    item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
    topk = (
        scored.groupBy(query_id)
        .agg(F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("top"))
        .select(query_id, F.explode("top").alias("t"))
        .select(
            query_id,
            F.col("t.id").alias(corpus_id),
            (-F.col("t.neg")).alias("score"),
        )
    )
    return topk


def self_queries(corpus: DataFrame, ids: list, corpus_id: str = "vec_id", corpus_vec: str = "embedding") -> DataFrame:
    """Build a query frame from corpus rows by id (for kNN-of-members)."""
    return corpus.filter(F.col(corpus_id).isin(ids)).select(
        F.col(corpus_id).alias("query_id"), F.col(corpus_vec).alias("query_vec")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """IVF-style approximate top-k: assign corpus rows to their nearest
    centroid (one broadcast pass), probe each query's ``nprobe`` nearest
    centroid cells only.

    At 100 TB the corpus is written out partitioned/bucketed by
    ``centroid_id`` once, so each query touches ~nprobe/C of the data —
    classic inverted-file pruning expressed as a partition-pruned join.
    """
    def nearest(df: DataFrame, vec: str, idc: str, n: int, out: str) -> DataFrame:
        assigned = df.crossJoin(F.broadcast(centroids)).select(
            *df.columns,
            F.col(centroid_id),
            cosine_similarity(vec, centroid_vec).alias("cscore"),
        )
        item = F.struct((-F.col("cscore")).alias("neg"), F.col(centroid_id).alias("cid"))
        return (
            assigned.groupBy(*df.columns)
            .agg(F.slice(F.sort_array(F.collect_list(item)), 1, n).alias("cells"))
            .select(*df.columns, F.explode(F.col("cells.cid")).alias(out))
        )

    corpus_cells = nearest(corpus, corpus_vec, corpus_id, 1, "cell")
    query_cells = nearest(queries, query_vec, query_id, nprobe, "cell")
    candidates = corpus_cells.join(query_cells, "cell").select(
        query_id,
        corpus_id,
        cosine_similarity(corpus_vec, query_vec).alias("score"),
    )
    item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
    return (
        candidates.groupBy(query_id)
        .agg(F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("top"))
        .select(query_id, F.explode("top").alias("t"))
        .select(query_id, F.col("t.id").alias(corpus_id), (-F.col("t.neg")).alias("score"))
    )


def grid_centroids(corpus: DataFrame, num: int, corpus_id: str = "vec_id", corpus_vec: str = "embedding") -> DataFrame:
    """Cheap deterministic centroids: every (n/num)-th corpus vector by id
    order. Stands in for a KMeans fit when determinism matters more than
    cell balance (tests, oracles)."""
    n = corpus.count()
    step = max(n // num, 1)
    picks = (
        corpus.select(F.col(corpus_id), F.col(corpus_vec))
        .filter(F.col(corpus_id) % step == 0)
        .limit(num)
    )
    return picks.select(
        F.col(corpus_id).alias("centroid_id"), F.col(corpus_vec).alias("centroid_vec")
    )
