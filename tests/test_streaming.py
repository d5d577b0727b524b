"""Structured Streaming: file-drop pages -> mentions / windowed stats /
micro-batch triples."""

from __future__ import annotations

import os

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.streaming.pipeline import (
    run_stream_to_triples,
    stream_page_stats,
    stream_pages,
    stream_mentions,
)


def _write_pages(spark, path, lo, hi):
    pages = synth.synthesize_pages(spark, hi).filter(f"doc_rank >= {lo}")
    pages.write.mode("append").parquet(path)


def test_streaming_mentions_and_stats(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream"))
    inp = os.path.join(root, "in")
    _write_pages(spark, inp, 0, 4)
    _write_pages(spark, inp, 4, 8)

    mentions = stream_mentions(stream_pages(spark, inp))
    q = (mentions.writeStream.format("memory").queryName("m_out")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    n = spark.sql("select count(*) c from m_out").first()["c"]
    assert n > 0

    stats = stream_page_stats(stream_pages(spark, inp))
    q2 = (stats.writeStream.format("memory").queryName("s_out")
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    rows = spark.sql("select * from s_out").collect()
    assert sum(r["n_pages"] for r in rows) == 8


def test_stream_to_triples_foreachbatch(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream2"))
    inp = os.path.join(root, "in")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    _write_pages(spark, inp, 0, 6)

    q = run_stream_to_triples(spark, inp, out, ckpt)
    q.awaitTermination(300)
    triples = spark.read.parquet(out)
    assert triples.count() > 0
    assert set(triples.columns) >= {"url", "subject", "relation", "object"}


def test_streaming_link_extraction_matches_batch(spark, tmp_path_factory):
    """html_links is a stateless narrow transform, so it composes onto a
    page stream unchanged and yields exactly the batch result."""
    from inclusionreferenceskg_spark.operators.multimodal import html_links

    root = str(tmp_path_factory.mktemp("slinks"))
    inp = os.path.join(root, "in")
    _write_pages(spark, inp, 0, 6)
    _write_pages(spark, inp, 6, 12)

    q = (html_links(stream_pages(spark, inp))
         .writeStream.format("memory").queryName("l_out")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql(
        "select src, href, anchor from l_out").collect())
    want = sorted(
        tuple(r) for r in
        html_links(spark.read.parquet(inp)).collect())
    assert got == want and len(got) > 0
