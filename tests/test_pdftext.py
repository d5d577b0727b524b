"""S1 PDF ingest: the self-contained extractor against the reference's own
PDFs (`resources/eu_documents/*.pdf`) — the input class the reference's
Tika-based `PDFParser` (pdf_parser.py:4-21) consumes.

Word-accurate, not byte-accurate vs the committed Tika .txt corpus; the
assertions check (a) known phrases extract intact, (b) the extracted text
drives the document-tree parser to the full article/chapter structure,
(c) the Spark operator plumbing."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from inclusionreferenceskg_spark.functions.doctree import parse_page
from inclusionreferenceskg_spark.functions.pdftext import pdf_to_text

REF = "/root/reference/inclusionreferenceskg"
GDPR_PDF = os.path.join(REF, "resources", "eu_documents", "gdpr.pdf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GDPR_PDF), reason="reference corpus not available")


@pytest.fixture(scope="module")
def gdpr_text():
    with open(GDPR_PDF, "rb") as f:
        return pdf_to_text(f.read())


def test_known_phrases_extracted(gdpr_text):
    for probe in (
        "Records of processing activities",
        "That record shall contain all of the following information:",
        "unless required to do so by Union",
        "the supervisory authority",
    ):
        assert probe in gdpr_text, probe


def test_document_tree_from_pdf(gdpr_text):
    rows = parse_page("eu://gdpr.pdf", "GDPR", gdpr_text)
    counts = Counter(r["node_type"] for r in rows)
    found = {r["number"] for r in rows if r["node_type"] == "Article"}
    # all 99 GDPR articles and all 11 chapters are recovered from raw PDF
    assert set(range(1, 100)) <= found
    assert counts["Chapter"] == 11
    a30 = next(r for r in rows
               if r["node_type"] == "Article" and r["number"] == 30)
    assert a30["title"] == "Records of processing activities"


def test_non_pdf_payload_yields_empty():
    # garbage must not crash: the object scan finds no pages
    assert pdf_to_text(b"not a pdf at all") == ""


def test_spark_operator(spark):
    from inclusionreferenceskg_spark.operators.multimodal import (
        pdf_to_text as op,
    )
    with open(GDPR_PDF, "rb") as f:
        blob = f.read()
    df = spark.createDataFrame(
        [("eu://gdpr.pdf", bytearray(blob)), ("eu://junk", bytearray(b"x"))],
        "url string, html binary")
    rows = {r["url"]: r["extracted_text"] for r in op(df).collect()}
    assert "Records of processing activities" in rows["eu://gdpr.pdf"]
    assert rows["eu://junk"] is None
