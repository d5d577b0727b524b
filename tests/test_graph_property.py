"""Property tests: graph operators against pure-Python simulators.

Hypothesis drives random small digraphs through the Spark plans and
imperative simulators (BFS, integer PageRank, brute-force triangle
enumeration), catching tie-break and boundary bugs the fixed link-graph
oracles cannot reach (isolated nodes, mutual edges, rank underflow)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from inclusionreferenceskg_spark.operators import graph as g

N_NODES = 6

edge_lists = st.lists(
    st.tuples(st.integers(0, N_NODES - 1), st.integers(0, N_NODES - 1))
    .filter(lambda p: p[0] != p[1]),
    min_size=0, max_size=12).map(lambda es: sorted(set(es)))


def _dfs(spark, edges):
    docs = spark.createDataFrame([(i,) for i in range(N_NODES)],
                                 "doc_id long")
    e = spark.createDataFrame(edges or [(0, 1)], "src long, dst long")
    if not edges:
        e = e.filter(F.lit(False))
    return docs, e


def _bfs_sim(edges, seeds, k):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for i in range(1, k + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = i
                    nxt.append(v)
        frontier = nxt
    return dist


def _pagerank_sim(edges, n, iters):
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    rank = {v: g.PR_SCALE // n for v in range(n)}
    base = (g.PR_SCALE * (g.PR_DAMP_DEN - g.PR_DAMP_NUM)) // (
        g.PR_DAMP_DEN * n)
    for _ in range(iters):
        contrib = defaultdict(int)
        for s, d in edges:
            contrib[d] += (rank[s] * g.PR_DAMP_NUM) // (
                g.PR_DAMP_DEN * outdeg[s])
        rank = {v: base + contrib[v] for v in range(n)}
    return rank


def _triangles_sim(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges}
    return sum(1 for a, b in und for c in range(N_NODES)
               if c > b and (a, c) in und and (b, c) in und)


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_khop_matches_bfs(spark, edges):
    docs, e = _dfs(spark, edges)
    seeds = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("node"))
    got = {r["node"]: r["dist"]
           for r in g.khop(seeds, e, k=2).collect()}
    assert got == _bfs_sim(edges, [0, 3], 2)


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_pagerank_matches_integer_simulator(spark, edges):
    docs, e = _dfs(spark, edges)
    got = {r["node"]: r["rank"]
           for r in g.pagerank(docs, e, iters=3).collect()}
    assert got == _pagerank_sim(edges, N_NODES, 3)


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_triangle_variants_match_enumeration(spark, edges):
    _, e = _dfs(spark, edges)
    want = _triangles_sim(edges)
    assert g.triangles(e).collect()[0]["n_triangles"] == want
    assert (g.triangles_degree_oriented(e)
            .collect()[0]["n_triangles"]) == want


def _sssp_sim(wedges, seeds, max_hops):
    """Hop-bounded Bellman-Ford, relaxing every edge each round."""
    dist = {s: 0 for s in seeds}
    for _ in range(max_hops):
        new = dict(dist)
        for s, d, w in wedges:
            if s in dist and dist[s] + w < new.get(d, float("inf")):
                new[d] = dist[s] + w
        dist = new
    return dist


weighted_edge_lists = st.lists(
    st.tuples(st.integers(0, N_NODES - 1), st.integers(0, N_NODES - 1),
              st.integers(1, 9))
    .filter(lambda p: p[0] != p[1]),
    min_size=0, max_size=12).map(
        lambda es: sorted({(s, d): w for s, d, w in es}.items())).map(
        lambda es: [(s, d, w) for (s, d), w in es])


@settings(max_examples=12, deadline=None)
@given(weighted_edge_lists)
def test_sssp_matches_bellman_ford(spark, wedges):
    docs = spark.createDataFrame([(i,) for i in range(N_NODES)],
                                 "doc_id long")
    e = spark.createDataFrame(wedges or [(0, 1, 1)],
                              "src long, dst long, w long")
    if not wedges:
        e = e.filter(F.lit(False))
    seeds = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("node"))
    got = {r["node"]: r["dist"]
           for r in g.sssp(seeds, e, max_hops=3).collect()}
    assert got == _sssp_sim(wedges, [0, 3], 3)


def _lpa_sim(edges, n, iters):
    """Sync label propagation, most-frequent neighbor label, ties to the
    smallest label, isolated nodes keep theirs."""
    sym = defaultdict(set)
    for s, d in edges:
        sym[s].add(d)
        sym[d].add(s)
    labels = {v: v for v in range(n)}
    for _ in range(iters):
        new = {}
        for v in range(n):
            if not sym[v]:
                new[v] = labels[v]
                continue
            counts = defaultdict(int)
            for u in sym[v]:
                counts[labels[u]] += 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_label_propagation_matches_simulator(spark, edges):
    docs, e = _dfs(spark, edges)
    got = {r["node"]: r["label"]
           for r in g.label_propagation(docs, e, iters=3).collect()}
    assert got == _lpa_sim(edges, N_NODES, 3)


def _wcc_sim(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = {x for e in edges for x in e}
    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            lo, hi = sorted((rs, rd))
            parent[hi] = lo
    comp = {n: find(n) for n in nodes}
    size = defaultdict(int)
    for c in comp.values():
        size[c] += 1
    return {n: (c, size[c]) for n, c in comp.items()}


@settings(max_examples=12, deadline=None)
@given(edge_lists)
def test_wcc_matches_union_find(spark, edges):
    _, e = _dfs(spark, edges)
    got = {r["node"]: (r["component"], r["component_size"])
           for r in g.wcc(e).collect()}
    assert got == _wcc_sim(edges)
