"""Spark-stage integration tests: parse -> detect -> qualify -> resolve."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.operators.detect import (
    build_qualifiers,
    detect_mentions,
)
from inclusionreferenceskg_spark.operators.parse import (
    extract_text,
    extracted_text_from_nodes,
    parse_pages,
)
from inclusionreferenceskg_spark.operators.resolve import resolve_targets

REF = "/root/reference/inclusionreferenceskg"
HERE = os.path.dirname(__file__)

N_DOCS = 24


@pytest.fixture(scope="module")
def pages(spark):
    return synth.synthesize_pages(spark, N_DOCS).cache()


@pytest.fixture(scope="module")
def nodes(pages):
    return parse_pages(pages).cache()


def test_parse_produces_expected_structure(nodes):
    counts = {r["node_type"]: r["count"] for r in
              nodes.groupBy("node_type").count().collect()}
    assert counts["Document"] == N_DOCS
    assert counts["Chapter"] == 2 * N_DOCS
    assert counts["Article"] == 6 * N_DOCS
    assert counts["Paragraph"] == 12 * N_DOCS
    assert counts.get("Point", 0) > 0
    assert counts.get("Indent", 0) > 0
    # header noise must have been filtered
    assert nodes.filter(F.col("content").contains("Official Journal")) \
        .count() == 0
    # soft hyphens deleted
    assert nodes.filter(F.col("content").contains("­")).count() == 0


def test_extract_text_consistent_between_implementations(pages, nodes):
    a = extract_text(pages).select("url", "sha256")
    b = extracted_text_from_nodes(nodes).select("url", "sha256")
    assert a.join(b, ["url", "sha256"]).count() == N_DOCS


def test_detect_and_qualify(nodes):
    mentions = detect_mentions(nodes)
    assert mentions.count() > N_DOCS  # every doc has mentions by construction
    quals = build_qualifiers(nodes)
    assert quals.count() >= mentions.count() * 0.5
    row = quals.filter(F.col("text") == "this Regulation").first()
    assert row is not None
    els = [e["node_type"] for e in row["qualifier"]]
    assert els[0] == "Root" and "Document" in els


def test_resolve_internal_and_cross_document(spark, pages, nodes):
    quals = build_qualifiers(nodes)
    resolved = resolve_targets(quals, nodes).cache()
    assert resolved.count() > 0

    # "this Regulation" resolves to the citing page's own Document node
    own = (resolved.filter(F.col("text") == "this Regulation")
           .filter(F.col("target_url") == F.col("url")))
    assert own.count() == resolved.filter(
        F.col("text") == "this Regulation").count() > 0

    # cross-document mentions "... of Regulation (EU) No k/2016" land on doc k-1
    cross = (resolved
             .filter(F.col("text").contains("of Regulation (EU) No"))
             .withColumn("k", F.regexp_extract(
                 "text", r"of Regulation \(EU\) No ([0-9]+)/2016", 1)
                 .cast("int"))
             .filter(F.col("k").isNotNull()))
    n_cross = cross.count()
    assert n_cross > 0
    bad = cross.filter(
        F.col("target_url") != F.concat(
            F.lit("https://synth.example/reg/"), (F.col("k") - 1).cast("string")))
    assert bad.count() == 0

    # resolved targets all exist in the nodes table
    tgt = resolved.join(
        nodes.select(F.col("node_id").alias("target_node_id")).distinct(),
        "target_node_id", "left_anti")
    assert tgt.count() == 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_spark_extracted_text_matches_reference_golden(spark):
    with open(os.path.join(HERE, "golden_hashes.json")) as f:
        hashes = json.load(f)
    rows = []
    for key, exp in hashes.items():
        chain, fname = key.split(":", 1)
        if chain != "default":
            continue
        with open(os.path.join(REF, "resources", "eu_documents", fname),
                  encoding="utf-8") as fh:
            rows.append((f"eu://{fname}", exp["title"], fh.read(),
                         exp["sha256"]))
    pages = spark.createDataFrame(rows, "url string, title string, "
                                        "text string, expected string")
    got = extract_text(pages)
    ok = pages.join(got, "url") \
        .filter(F.col("sha256") == F.col("expected")).count()
    assert ok == len(rows) == 12
