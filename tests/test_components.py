"""Connected-components + merge-rewrite semantics.

Merge-pair data lifted from the reference's batched-merge tests
(tests/kg_creation/test_knolwedge_graph.py): chained/cyclic/complete merge
groups must collapse to one canonical node per component; edge rewrite must
drop self-loops and redirect in/out edges (merge semantics,
knowledge_graph.py:64-112).  The reference's nondeterministic set.pop()
winner is determinized to min-id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inclusionreferenceskg_spark.operators.kg import (
    apply_merges,
    connected_components,
)


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [("u://x", a, b) for a, b in pairs], "url string, a string, b string")


def test_batched_merge_single_component(spark):
    pairs = _pairs(spark, [("1", "2"), ("2", "3"), ("3", "1"),
                           ("4", "1"), ("5", "2"), ("6", "3")])
    canon = connected_components(pairs)
    labels = {r["kg_id"]: r["canon_id"] for r in canon.collect()}
    assert set(labels.values()) == {"1"}
    assert set(labels) == {"1", "2", "3", "4", "5", "6"}


def test_batch_merge_components(spark):
    merges = [("1", "2"), ("2", "3"), ("3", "4"), ("2", "4"),
              ("5", "6"), ("6", "7"),
              ("9", "10"), ("9", "11"), ("9", "12"),
              ("10", "11"), ("10", "12"), ("11", "12")]
    canon = connected_components(_pairs(spark, merges))
    labels = {r["kg_id"]: r["canon_id"] for r in canon.collect()}
    # node 8 never merged -> absent from the map (identity by default)
    assert "8" not in labels
    comps = {}
    for k, v in labels.items():
        comps.setdefault(v, set()).add(k)
    # canonical = lexicographic min id ("10" < "9"; real kg ids are
    # fixed-width so lexicographic == insertion-stable)
    assert comps == {
        "1": {"1", "2", "3", "4"},
        "5": {"5", "6", "7"},
        "10": {"9", "10", "11", "12"},
    }


def test_merge_edge_rewrite(spark):
    # u <- o1, u -> o2, v -> o3, o4 -> v; merge(u, v) keeps all four edges
    # on the canonical node and drops any u<->v edges as self loops
    edges = spark.createDataFrame(
        [("u://x", "o1", "u", "dummy", None, 0),
         ("u://x", "u", "o2", "dummy", None, 1),
         ("u://x", "v", "o3", "dummy", None, 2),
         ("u://x", "o4", "v", "dummy", None, 3),
         ("u://x", "u", "v", "dummy", None, 4)],
        "url string, src string, dst string, label string, "
        "attrs map<string,string>, emit_seq int")
    canon = connected_components(_pairs(spark, [("u", "v")]))
    final = apply_merges(None, edges, canon)
    got = {(r["src"], r["dst"]) for r in final.collect()}
    assert got == {("o1", "u"), ("u", "o2"), ("u", "o3"), ("o4", "u")}


def test_duplicate_edges_keep_last_write(spark):
    edges = spark.createDataFrame(
        [("u://x", "a", "b", "patient", None, 0),
         ("u://x", "a", "b", "agent", None, 7)],
        "url string, src string, dst string, label string, "
        "attrs map<string,string>, emit_seq int")
    canon = connected_components(_pairs(spark, []))
    final = apply_merges(None, edges, canon).collect()
    assert len(final) == 1
    assert final[0]["label"] == "agent"  # last write wins (add_edge overwrite)


def test_duplicate_split_matches_full_window(spark):
    """apply_merges' broadcast singleton/duplicate split must produce the
    exact row set of the full-table window it replaces; cutoff=0 forces
    the web-scale full-window path on the same input (mixed singleton and
    duplicate keys, plus a self-loop that must drop on both paths)."""
    edges = spark.createDataFrame(
        [("u://x", "a", "b", "patient", None, 0),
         ("u://x", "a", "b", "agent", None, 7),
         ("u://x", "a", "c", "loner", None, 1),
         ("u://y", "a", "b", "other-url", None, 2),
         ("u://x", "d", "d", "selfloop", None, 3),
         ("u://x", "e", "f", "dup1", None, 4),
         ("u://x", "e", "f", "dup2", None, 5)],
        "url string, src string, dst string, label string, "
        "attrs map<string,string>, emit_seq int")
    canon = connected_components(_pairs(spark, []))

    def rows(df):
        return {(r["url"], r["src"], r["dst"], r["label"])
                for r in df.collect()}

    split = rows(apply_merges(None, edges, canon))
    window = rows(apply_merges(None, edges, canon, dup_broadcast_cutoff=0))
    assert split == window == {
        ("u://x", "a", "b", "agent"),
        ("u://x", "a", "c", "loner"),
        ("u://y", "a", "b", "other-url"),
        ("u://x", "e", "f", "dup2"),
    }


def test_components_distributed_loop_matches_fast_path(spark):
    """The driver-side small-quotient fast path and the distributed
    min-label loop must produce identical canonical maps; cutoff=0 forces
    the loop on the same input."""
    merges = [("1", "2"), ("2", "3"), ("3", "4"), ("2", "4"),
              ("5", "6"), ("6", "7"),
              ("9", "10"), ("9", "11"), ("9", "12")]
    fast = {(r["kg_id"], r["canon_id"])
            for r in connected_components(_pairs(spark, merges)).collect()}
    loop = {(r["kg_id"], r["canon_id"])
            for r in connected_components(
                _pairs(spark, merges),
                small_quotient_cutoff=0).collect()}
    assert fast == loop
    assert fast  # non-empty


def _l3_fixture(spark):
    """Tiny corpus with a non-empty L3 candidate set: one reference from
    src kg node s1 to document node n1, whose subtree (n1, n2, n3) holds
    one same-lemma-set kg node (g1) plus decoys (wrong key, wrong url,
    outside the subtree, the src itself)."""
    from pyspark.sql import types as T

    pe = T.StructType([T.StructField("node_type", T.StringType()),
                       T.StructField("number", T.IntegerType()),
                       T.StructField("title", T.StringType())])
    nodes = spark.createDataFrame(
        [("u1", "n1", [("Document", 1, "d")]),
         ("u1", "n2", [("Document", 1, "d"), ("Article", 1, None)]),
         ("u1", "n3", [("Document", 1, "d"), ("Article", 2, None)]),
         ("u1", "n4", [("Document", 2, "e")]),          # outside subtree
         ("u2", "m1", [("Document", 1, "d")])],
        T.StructType([T.StructField("url", T.StringType()),
                      T.StructField("node_id", T.StringType()),
                      T.StructField("path", T.ArrayType(pe))]))
    kg_cols = ("url string, node_id string, kg_id string, kind string, "
               "token_key string, para_key string, coref_lemma string, "
               "coref_tag string, propn_key string, lemma_set_key string")
    kg_nodes = spark.createDataFrame(
        [("u1", "n1", "s1", "object", "tk-s1", None, None, None, None, "k"),
         ("u1", "n2", "g1", "object", "tk-g1", None, None, None, None, "k"),
         ("u1", "n3", "g2", "object", "tk-g2", None, None, None, None, "x"),
         ("u1", "n4", "g3", "object", "tk-g3", None, None, None, None, "k"),
         ("u2", "m1", "g4", "object", "tk-g4", None, None, None, None, "k")],
        kg_cols)
    l3 = spark.createDataFrame(
        [("u1", "s1", "k", "n1", "u1")],
        "url string, src_kg_id string, lemma_set_key string, "
        "target_node_id string, target_url string")
    return kg_nodes, l3, nodes


def test_l3_broadcast_plan_matches_shuffle_plan(spark):
    """The adaptive L3 join (candidate-driven broadcast plan) must emit
    the identical pair set as the corpus-shuffle fallback, on a corpus
    where every decoy class is present."""
    from inclusionreferenceskg_spark.operators.kg import entity_link_pairs

    kg_nodes, l3, nodes = _l3_fixture(spark)
    want_l3 = {("u1", "s1", "g1")}

    def rows(df):
        return {(r.url, r.a, r.b) for r in df.collect()}

    bcast = rows(entity_link_pairs(kg_nodes, l3, nodes))
    bcast_guarded = rows(entity_link_pairs(kg_nodes, l3, nodes,
                                           l3_hits_cutoff=0))
    shuffle = rows(entity_link_pairs(kg_nodes, l3, nodes,
                                     l3_broadcast_cutoff=0))
    assert bcast == bcast_guarded == shuffle
    assert want_l3 <= bcast  # the genuine L3 pair is present
    # decoys excluded on every plan
    for bad in [("u1", "s1", "g2"), ("u1", "s1", "g3"),
                ("u1", "s1", "g4"), ("u1", "s1", "s1")]:
        assert bad not in bcast


def test_l3_empty_candidates_short_circuit(spark):
    """Zero candidates -> identical output to the shuffle plan (which
    joins through an empty side) with no corpus-scale join inputs."""
    from inclusionreferenceskg_spark.operators.kg import entity_link_pairs

    kg_nodes, l3, nodes = _l3_fixture(spark)
    empty = l3.filter(F.lit(False))
    fast = {(r.url, r.a, r.b)
            for r in entity_link_pairs(kg_nodes, empty, nodes).collect()}
    slow = {(r.url, r.a, r.b)
            for r in entity_link_pairs(kg_nodes, empty, nodes,
                                       l3_broadcast_cutoff=0).collect()}
    assert fast == slow
    # the fused star (L1 token groups etc.) is unaffected by the
    # short-circuit; no pair references the L3 target machinery
    assert all(a != "s1" or b != "g1" for _, a, b in fast)
