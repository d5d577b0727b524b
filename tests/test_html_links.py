"""Real link-graph extraction from the html payload (input_hint's
html:binary column): href/anchor parsing + graph-operator composition."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.operators import graph as g
from inclusionreferenceskg_spark.operators.multimodal import (
    html_links,
    page_link_graph,
)

N = 20


def test_html_links_match_generator(spark):
    pages = synth.synthesize_pages(spark, N)
    got = defaultdict(list)
    for r in html_links(pages).collect():
        got[r["src"]].append((r["href"], r["anchor"]))
    for i in range(N):
        want = [(synth.doc_url(t), synth.doc_title(t))
                for t in synth.page_out_links(i, N)]
        assert got[synth.doc_url(i)] == want  # document order preserved


def test_null_and_linkless_html_emit_nothing(spark):
    pages = spark.createDataFrame(
        [("u://1", None), ("u://2", bytearray(b"<html><p>no links</p>"))],
        "url string, html binary")
    assert html_links(pages).count() == 0


def test_link_graph_composes_with_graph_ops(spark):
    pages = synth.synthesize_pages(spark, N)
    edges = page_link_graph(pages)
    erows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert all(s != d for s, d in erows)
    assert len(set(erows)) == len(erows)

    # k-hop BFS over the REAL graph vs a python simulator on its edges
    adj = defaultdict(list)
    for s, d in erows:
        adj[s].append(d)
    seed_url = synth.doc_url(0)
    want = {seed_url: 0}
    frontier = [seed_url]
    for i in (1, 2):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in want:
                    want[v] = i
                    nxt.append(v)
        frontier = nxt
    seeds = spark.createDataFrame([(seed_url,)], "node string")
    got = {r["node"]: r["dist"]
           for r in g.khop(seeds, edges, k=2).collect()}
    assert got == want
