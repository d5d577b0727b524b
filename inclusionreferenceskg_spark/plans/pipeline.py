"""End-to-end pipeline plans: pages -> nodes -> mentions -> resolved ->
knowledge graph -> triples.

Mirrors the reference's ``create_graph`` product path (``kg_renderer.py:
184-259``; lifecycle trace in SURVEY §3.1) as composable DataFrame stages.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from inclusionreferenceskg_spark.operators import kg as kg_ops
from inclusionreferenceskg_spark.operators.detect import build_qualifiers
from inclusionreferenceskg_spark.operators.parse import parse_pages
from inclusionreferenceskg_spark.operators.resolve import resolve_targets


@dataclass
class GraphResult:
    nodes: DataFrame
    qualifiers: DataFrame
    resolved: DataFrame
    kg_nodes: DataFrame
    kg_edges: DataFrame
    canon: DataFrame
    triples: DataFrame


def run_pipeline(pages: DataFrame, include_extensions: bool = False,
                 cache: bool = True) -> GraphResult:
    """The full product pipeline over a pages DataFrame."""
    nodes = parse_pages(pages)
    if cache:
        # a lazy cache is sufficient here: the downstream diamond (the
        # resolve join references nodes via two branches) is ONE job, and
        # the DAG scheduler computes the shared lineage once regardless of
        # cache state — the concurrent-first-use race only bites across
        # separate actions, which is why `wide` (referenced by ~10
        # downstream actions) uses an eager localCheckpoint instead
        # (operators/kg.py:build_graph)
        nodes = nodes.cache()
    qualifiers = build_qualifiers(nodes)
    resolved = resolve_targets(qualifiers, nodes)
    kn, edges, canon, triples = kg_ops.build_graph(nodes, resolved,
                                                   include_extensions)
    return GraphResult(nodes, qualifiers, resolved, kn, edges, canon, triples)
