"""Round-3 verdict task 6: iterative graph operators must not leak
CacheManager entries across invocations in a long-lived session.

Every loop (khop / sssp / pagerank / label_propagation, plus the
persisted canonical-edge tables in both triangle counters) persists
per-round state; ``graph._finish`` materializes the result once and
unpersists all of it.  The assert is on Spark's CacheManager — the
structure the round-3 verdict observed accumulating — which must be
EMPTY after each operator returns (the result itself is backed by
localCheckpoint blocks owned by its RDD, reclaimed by the
ContextCleaner when the caller drops the frame, not CacheManager
entries).
"""

import pytest
from pyspark.sql import functions as F

from inclusionreferenceskg_spark.operators import graph as G


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def tiny(spark):
    spark.catalog.clearCache()
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    edges = G.link_edges(docs)
    return docs, edges


def test_khop_cache_flat(spark, tiny):
    docs, edges = tiny
    seeds = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("node"))
    out = G.khop(seeds, edges, k=3)
    assert out.count() > 0
    assert _cache_empty(spark)


def test_sssp_cache_flat(spark, tiny):
    docs, edges = tiny
    seeds = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("node"))
    out = G.sssp(seeds, G.weighted_edges(edges), max_hops=3)
    assert out.count() > 0
    assert _cache_empty(spark)


def test_pagerank_cache_flat_over_repeated_calls(spark, tiny):
    docs, edges = tiny
    for _ in range(3):
        out = G.pagerank(docs, edges, iters=3)
        assert out.count() == 40
        assert _cache_empty(spark)


def test_label_propagation_cache_flat(spark, tiny):
    docs, edges = tiny
    out = G.label_propagation(docs, edges, iters=3)
    assert out.count() == 40
    assert _cache_empty(spark)


def test_triangles_cache_flat(spark, tiny):
    _, edges = tiny
    assert G.triangles(edges).count() == 1
    assert G.triangles_degree_oriented(edges).count() == 1
    assert _cache_empty(spark)
