"""Graph-analytics operators on hand-built graphs (oracle parity is
covered by test_oracles.py; these pin the semantics independently)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inclusionreferenceskg_spark.operators import graph as g


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_degrees_counts_and_zeroes(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    out = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in g.degrees(_docs(spark, [1, 2, 3, 4]), e).collect()}
    assert out == {1: (2, 0), 2: (1, 1), 3: (0, 2), 4: (0, 0)}


def test_khop_bfs_distances(spark):
    # path 1->2->3->4 plus shortcut 1->3: dist(3) must be 1, not 2
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3)])
    seeds = _docs(spark, [1]).select(F.col("doc_id").alias("node"))
    got = {r["node"]: r["dist"] for r in g.khop(seeds, e, k=2).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_khop_radius_bound(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = _docs(spark, [1]).select(F.col("doc_id").alias("node"))
    nodes = {r["node"] for r in g.khop(seeds, e, k=2).collect()}
    assert nodes == {1, 2, 3}  # 4 is 3 hops away


def test_triangles_counts_each_once(spark):
    # one triangle (1,2,3) expressed with mixed edge directions, plus a
    # dangling edge and a duplicate that must not double-count
    e = _edges(spark, [(1, 2), (3, 2), (1, 3), (3, 4), (2, 1)])
    assert g.triangles(e).collect()[0]["n_triangles"] == 1


def test_triangles_degree_oriented_matches_id_oriented(spark):
    # K4 plus a pendant: 4 triangles; a hub node exercises the
    # degree-orientation tie-breaks
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    e = _edges(spark, k4 + [(4, 5)])
    assert g.triangles(e).collect()[0]["n_triangles"] == 4
    assert (g.triangles_degree_oriented(e)
            .collect()[0]["n_triangles"]) == 4


def test_pagerank_mass_and_ordering(spark):
    # star: everyone links to 0 -> node 0 must outrank the leaves, and
    # total integer mass stays within rounding of PR_SCALE
    docs = _docs(spark, range(6))
    e = _edges(spark, [(i, 0) for i in range(1, 6)])
    ranks = {r["node"]: r["rank"]
             for r in g.pagerank(docs, e, iters=3).collect()}
    leaf = ranks[1]
    assert all(ranks[i] == leaf for i in range(2, 6))
    assert ranks[0] > 3 * leaf
    total = sum(ranks.values())
    assert total <= g.PR_SCALE
    # node 0 has no out-links: its (damped) mass is dropped each
    # iteration, so the floor is loose but must stay the same order
    assert total > g.PR_SCALE // 4


def test_link_edges_deterministic_and_loop_free(spark):
    docs = _docs(spark, range(40))
    a = sorted(map(tuple, g.link_edges(docs).collect()))
    b = sorted(map(tuple, g.link_edges(docs).collect()))
    assert a == b
    assert all(s != d for s, d in a)
    assert all(0 <= d < 40 for _, d in a)
    assert len(a) >= 40  # fanout 3 minus collisions stays well above 1/doc
