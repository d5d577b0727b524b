"""Cross-document entity canonicalization (global_entities + the
kg_entities catalog entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inclusionreferenceskg_spark import queries as catalog
from inclusionreferenceskg_spark.operators import kg as kg_ops

SF_DIR = "/root/testdata/sf0.001"

KG_NODES_COLS = ("url string, kg_id string, propn_key string")


def test_global_entities_blocks_across_urls(spark):
    rows = [
        ("u1", "id3", "Commission\x1fEuropean"),
        ("u2", "id1", "Commission\x1fEuropean"),
        ("u2", "id2", "Commission\x1fEuropean"),
        ("u3", "id9", "Parliament\x1f"),
        ("u1", "id7", None),  # non-PROPN: excluded
    ]
    kn = spark.createDataFrame(rows, KG_NODES_COLS)
    got = {r["entity_key"]: r for r in
           kg_ops.global_entities(kn).collect()}
    assert set(got) == {"Commission\x1fEuropean", "Parliament\x1f"}
    ent = got["Commission\x1fEuropean"]
    # min kg_id wins deterministically; doc/mention counts are global
    assert ent["global_id"] == "id1"
    assert ent["n_docs"] == 2 and ent["n_mentions"] == 3
    assert got["Parliament\x1f"]["global_id"] == "id9"


def test_kg_entities_invariants(spark):
    ents = catalog.QUERIES["kg_entities"](spark, SF_DIR)
    res = catalog.QUERIES["kg_resolved"](spark, SF_DIR)

    e = ents.agg(F.sum("n_mentions").alias("m"),
                 F.count("*").alias("k"),
                 F.min("n_citing_docs").alias("lo")).first()
    # every resolved mention lands in exactly one entity row
    assert e["m"] == res.count()
    assert e["k"] > 0 and e["lo"] >= 1
    # the corpus genuinely exercises cross-document canonicalization
    assert ents.filter(F.col("n_citing_docs") > 1).count() > 0
    # entity keys are unique
    assert ents.select("target_url", "target_node_id").distinct() \
               .count() == e["k"]
