"""Evaluation operators + evaluation-data sources."""

from __future__ import annotations

import os

import pytest

from inclusionreferenceskg_spark.operators.evaluate import (
    detector_alignment_prf,
    triple_prf,
)
from inclusionreferenceskg_spark.sources import readers, sinks

REF = "/root/reference/inclusionreferenceskg"


def test_triple_prf_exact_sets(spark):
    actual = spark.createDataFrame(
        [("u", "a", "agent", "b"), ("u", "a", "patient", "c"),
         ("u", "x", "contains", "y")],  # structural: excluded
        "url string, subject string, relation string, object string")
    expected = spark.createDataFrame(
        [("a", "agent", "b"), ("a", "conditional", "d")],
        "subject string, relation string, object string")
    stats = triple_prf(actual, expected)
    assert stats.n_detected == 2
    assert stats.n_expected == 2
    assert stats.false_positives == 1  # (a, patient, c)
    assert stats.false_negatives == 1  # (a, conditional, d)
    assert stats.precision() == 0.5
    assert stats.recall() == 0.5


def test_detector_alignment_is_order_sensitive():
    stats = detector_alignment_prf(["A", "B", "C"], ["A", "C", "B"])
    # SequenceMatcher alignment: one of B/C misaligns in both directions
    assert stats.false_positives == 1
    assert stats.false_negatives == 1


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_readers_on_reference_gold_data(spark):
    refs = readers.read_gold_references(
        spark, os.path.join(REF, "resources/evaluation_data/"
                                 "gdpr_references.csv"))
    assert refs.count() == 663
    first = refs.orderBy("seq").first()
    assert first["text"] == "This Regulation"

    res = readers.read_expected_resolutions(
        spark, os.path.join(REF, "resources/evaluation_data/"
                                 "gdpr_resolved.json"))
    assert res.select("mention_seq").distinct().count() == 663

    triples = readers.read_golden_triples(
        spark, os.path.join(REF, "resources/evaluation_data/kg_triplets/"
                                 "gdpr_article_30.csv"))
    assert triples.count() == 70


def test_dot_sink(spark):
    edges = spark.createDataFrame(
        [("u", "n1", "n2", "agent")],
        "url string, src string, dst string, label string")
    displays = spark.createDataFrame(
        [("n1", "do"), ("n2", "thing")], "kg_id string, display string")
    dot = sinks.to_dot(edges, displays)
    assert '"do" -> "thing" [label="agent"];' in dot


def test_svg_sink(spark):
    edges = spark.createDataFrame(
        [("u", "n1", "n2", "agent"), ("u", "n2", "n3", "patient"),
         ("u", "n1", "n3", "conditional")],
        "url string, src string, dst string, label string")
    displays = spark.createDataFrame(
        [("n1", "require"), ("n2", "process"), ("n3", "data")],
        "kg_id string, display string")
    svg = sinks.to_svg(edges, displays)
    assert svg.startswith("<svg")
    assert svg.count("<ellipse") == 3
    assert svg.count("marker-end") == 3
    for label in ("require", "process", "data", "agent", "patient",
                  "conditional"):
        assert label in svg
    # layering: n1 above n2 above n3 (longest path)
    import re
    ys = {m.group(2): float(m.group(1)) for m in re.finditer(
        r'<text x="[-\d.]+" y="([-\d.]+)" font-size="10" '
        r'text-anchor="middle">(\w+)', svg)}
    assert ys["require"] < ys["process"] < ys["data"]
