"""Oracle-adjacent referential-integrity invariants for the kg_* outputs.

The kg_* catalog rows are `no_oracle` in the driver's DuckDB gate (the KG
pipeline is not SQL-expressible), so this suite materializes the pipeline
outputs to parquet and checks DuckDB-verifiable invariants over them —
the "referential-integrity twin" of a value oracle:

* every final edge endpoint resolves (to a canonical kg node or a document
  node);
* canonical ids are component minima: `canon_id <= kg_id` for every member
  (min-id winner, the documented determinization of the reference's
  `set.pop()` merge) and the map is idempotent in SQL;
* one edge per (url, src, dst) — the reference's `add_edge` overwrite
  semantics (knowledge_graph.py:23-43);
* triple count == final-edge count after the defines/contains exclusion
  (the display join drops nothing);
* no self loops; canonical targets never dangle.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.plans.pipeline import run_pipeline

N_DOCS = 10


@pytest.fixture(scope="module")
def kg_dir(spark, tmp_path_factory):
    from inclusionreferenceskg_spark.operators.detect import detect_mentions
    out = str(tmp_path_factory.mktemp("kg_parquet"))
    res = run_pipeline(synth.synthesize_pages(spark, N_DOCS))
    res.nodes.write.parquet(f"{out}/nodes")
    detect_mentions(res.nodes).write.parquet(f"{out}/mentions")
    res.qualifiers.write.parquet(f"{out}/qualifiers")
    res.resolved.write.parquet(f"{out}/resolved")
    res.kg_nodes.write.parquet(f"{out}/kg_nodes")
    res.kg_edges.write.parquet(f"{out}/kg_edges")
    res.canon.write.parquet(f"{out}/canon")
    res.triples.write.parquet(f"{out}/triples")
    return out


@pytest.fixture(scope="module")
def ddb(kg_dir):
    con = duckdb.connect()
    for t in ("nodes", "mentions", "qualifiers", "resolved", "kg_nodes",
              "kg_edges", "canon", "triples"):
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{kg_dir}/{t}/*.parquet')")
    yield con
    con.close()


def test_edge_endpoints_resolve(ddb):
    dangling = ddb.execute("""
        with ids as (
          select canon_ids.id from (
            select coalesce(c.canon_id, k.kg_id) as id
            from kg_nodes k left join canon c on k.kg_id = c.kg_id
          ) canon_ids
          union all select node_id as id from nodes
        ),
        endpoints as (
          select src as id from kg_edges
          union all select dst as id from kg_edges
        )
        select count(*) from endpoints e
        where not exists (select 1 from ids i where i.id = e.id)
    """).fetchone()[0]
    assert dangling == 0


def test_canon_ids_are_component_minima(ddb):
    # min-id winner: the canonical id is never larger than any member id
    bad = ddb.execute(
        "select count(*) from canon where canon_id > kg_id").fetchone()[0]
    assert bad == 0
    # idempotence in SQL: canon(canon(x)) == canon(x)
    not_fixed = ddb.execute("""
        select count(*) from canon a join canon b
        on a.canon_id = b.kg_id where b.canon_id != a.canon_id
    """).fetchone()[0]
    assert not_fixed == 0


def test_one_edge_per_uv_and_no_self_loops(ddb):
    dups = ddb.execute("""
        select count(*) from (
          select url, src, dst, count(*) as n from kg_edges
          group by url, src, dst having count(*) > 1)
    """).fetchone()[0]
    assert dups == 0
    loops = ddb.execute(
        "select count(*) from kg_edges where src = dst").fetchone()[0]
    assert loops == 0


def test_triple_count_matches_edges(ddb):
    n_edges = ddb.execute("""
        select count(*) from kg_edges
        where label not in ('defines', 'contains')
    """).fetchone()[0]
    n_triples = ddb.execute("select count(*) from triples").fetchone()[0]
    assert n_triples == n_edges
    # and the relation vocabulary survived intact
    rels = {r[0] for r in ddb.execute(
        "select distinct relation from triples").fetchall()}
    assert rels <= {"agent", "patient", "conditional"}


def test_structural_edges_reference_real_nodes(ddb):
    # every contains edge links two document nodes of the same url
    bad = ddb.execute("""
        select count(*) from kg_edges e
        where e.label = 'contains' and (
          not exists (select 1 from nodes n
                      where n.node_id = e.src and n.url = e.url)
          or not exists (select 1 from nodes n
                         where n.node_id = e.dst and n.url = e.url))
    """).fetchone()[0]
    assert bad == 0


def _depth_case() -> str:
    """DuckDB CASE mapping node_type -> depth rank (the reference's
    per-type `depth` class attributes, reference_resolver.py:106 sorts
    qualifiers by it)."""
    from inclusionreferenceskg_spark.functions.doctree import DEPTH
    whens = " ".join(f"when '{t}' then {d}" for t, d in DEPTH.items())
    return f"case e.node_type {whens} else 99 end"


_MENTION_BOUNDS_SQL = """
    select count(*) from mentions m join nodes n using (url, node_id)
    where m.start < {off} or m.start + length(m.text) > length(n.content)
       or substr(n.content, m.start + 1 + {off}, length(m.text)) != m.text
"""


def test_mention_offsets_within_content(ddb):
    # every detected mention is an exact substring of its node's content
    # at the recorded 0-based offset
    n_mentions = ddb.execute("select count(*) from mentions").fetchone()[0]
    assert n_mentions > 0
    bad = ddb.execute(_MENTION_BOUNDS_SQL.format(off=0)).fetchone()[0]
    assert bad == 0
    # seeded fault: shifting every offset by one must violate the check
    seeded = ddb.execute(_MENTION_BOUNDS_SQL.format(off=1)).fetchone()[0]
    assert seeded > 0


def test_qualifier_depth_sorted(ddb):
    # a qualifier's pattern elements are depth-sorted shallow->deep
    # (reference_resolver.py:106: resolved.sort(key=lambda x: x.depth))
    case = _depth_case()
    bad = ddb.execute(f"""
        select count(*) from qualifiers
        where list_transform(qualifier, e -> {case}) !=
              list_sort(list_transform(qualifier, e -> {case}))
    """).fetchone()[0]
    assert bad == 0
    # seeded fault: reversing the qualifier must violate the check for at
    # least one multi-element qualifier
    seeded = ddb.execute(f"""
        select count(*) from (
          select list_reverse(qualifier) as qualifier from qualifiers
          where len(qualifier) > 1) q2,
        lateral (select 1 as one) l
        where list_transform(qualifier, e -> {case}) !=
              list_sort(list_transform(qualifier, e -> {case}))
    """).fetchone()[0]
    assert seeded > 0


def test_resolved_target_path_matches_qualifier(ddb):
    # the resolver is a path automaton: every numbered structural element
    # of the winning qualifier must appear as (node_type, number) in the
    # resolved target's root-to-node path (Document/Root elements are
    # identity/title-matched, not path elements of the same document)
    n_resolved = ddb.execute("select count(*) from resolved").fetchone()[0]
    assert n_resolved > 0
    bad = ddb.execute("""
        select count(*) from resolved r
        join qualifiers q using (url, node_id, mention_idx, qual_idx)
        join nodes n on n.url = r.target_url
                    and n.node_id = r.target_node_id
        where len(list_filter(q.qualifier,
              e -> e.number is not null
                   and e.node_type not in ('Document', 'Root')
                   and not list_contains(
                         list_transform(n.path, p ->
                           p.node_type || '#' ||
                           coalesce(cast(p.number as varchar), '')),
                         e.node_type || '#' ||
                         cast(e.number as varchar)))) > 0
    """).fetchone()[0]
    assert bad == 0
    # seeded fault: pointing every resolution at the target's PARENT node
    # must break path containment for leaf-level qualifiers
    seeded = ddb.execute("""
        select count(*) from resolved r
        join qualifiers q using (url, node_id, mention_idx, qual_idx)
        join nodes c on c.url = r.target_url
                    and c.node_id = r.target_node_id
        join nodes n on n.url = c.url and n.node_id = c.parent_id
        where len(list_filter(q.qualifier,
              e -> e.number is not null
                   and e.node_type not in ('Document', 'Root')
                   and not list_contains(
                         list_transform(n.path, p ->
                           p.node_type || '#' ||
                           coalesce(cast(p.number as varchar), '')),
                         e.node_type || '#' ||
                         cast(e.number as varchar)))) > 0
    """).fetchone()[0]
    assert seeded > 0


def test_defines_edges_from_owning_node(ddb):
    # defines edges originate at a document node and end at a predicate
    bad = ddb.execute("""
        select count(*) from kg_edges e
        where e.label = 'defines' and not exists
          (select 1 from nodes n where n.node_id = e.src)
    """).fetchone()[0]
    assert bad == 0
    if os.environ.get("KG_INVARIANTS_VERBOSE"):
        print(ddb.execute(
            "select label, count(*) from kg_edges group by label").fetchall())
