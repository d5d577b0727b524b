"""html_to_text (S1), gold-standard detection (D3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.operators.detect import detect_gold_mentions
from inclusionreferenceskg_spark.operators.multimodal import html_to_text
from inclusionreferenceskg_spark.operators.parse import parse_pages


def test_html_to_text(spark):
    pages = spark.createDataFrame(
        [("u://1", bytearray(b"<html><script>x=1</script>"
                             b"<body><p>Hello  world</p></body></html>"))],
        "url string, html binary")
    row = html_to_text(pages).first()
    assert row["extracted_text"] == "Hello world"


def test_gold_detection_greedy_in_order(spark):
    pages = synth.synthesize_pages(spark, 2)
    nodes = parse_pages(pages).cache()
    # use the regex-detected mentions of one doc as the "gold" list
    from inclusionreferenceskg_spark.operators.detect import detect_mentions
    gold_src = (detect_mentions(nodes)
                .orderBy("url", "seq", "mention_idx"))
    gold = gold_src.select(
        "url",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("url").orderBy("seq", "mention_idx")).alias("seq"),
        "text")
    got = detect_gold_mentions(nodes, gold)
    # greedy in-order find over the same document recovers every mention
    assert got.count() == gold.count()
    assert got.groupBy("url").count().count() == 2
