"""Input robustness: the pipeline must survive the degenerate rows a real
Common-Crawl-style table contains (null text, empty pages, exotic
unicode, control bytes, megabyte single-document outliers) — parquet
columns are always nullable regardless of the writer's schema."""

from __future__ import annotations

import datetime

from pyspark.sql.types import StructField, StructType

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.operators.detect import detect_mentions
from inclusionreferenceskg_spark.operators.parse import parse_pages
from inclusionreferenceskg_spark.plans.pipeline import run_pipeline

TS = datetime.datetime(2016, 5, 4, tzinfo=datetime.timezone.utc)


def _nullable_pages(spark, rows):
    schema = StructType([StructField(f.name, f.dataType, True)
                         for f in synth.PAGES_SCHEMA.fields])
    return spark.createDataFrame(rows, schema)


def _row(i, text, html=b""):
    return (f"http://x/{i}", TS, html, text, "en", f"t{i}", i)


DEGENERATE = [
    _row(0, None, html=None),
    _row(1, ""),
    _row(2, "Article 1\néü中文 \U0001f600 shall apply "
            "to Article 2 of Regulation (EU) 2016/679."),
    _row(3, "Article 1\n\x00\x01\x02 of weird \x7f bytes"),
    _row(4, "   \n\t\n   "),
]


def test_pipeline_survives_degenerate_pages(spark):
    pages = _nullable_pages(spark, DEGENERATE)
    res = run_pipeline(pages)
    # no exception end-to-end and the parseable pages still yield nodes
    assert res.nodes.count() > 0
    assert res.triples.count() >= 0


def test_degenerate_mixed_with_real_pages_changes_nothing(spark):
    real = synth.synthesize_pages(spark, 6)
    want = run_pipeline(real).triples
    want_rows = sorted(map(tuple, want.collect()))

    mixed = _nullable_pages(
        spark,
        [tuple(r) for r in real.collect()] + DEGENERATE)
    got = run_pipeline(mixed).triples
    got_real = got.filter(~got["url"].startswith("http://x/"))
    assert sorted(map(tuple, got_real.collect())) == want_rows


def test_detect_on_huge_single_doc(spark):
    # a single multi-MB document must not OOM a task or hang the regex
    big = ("Article 1\n\nSubject matter\n\n1. " + "lorem ipsum " * 150_000
           + "shall apply.\n\n2. The processor shall act as referred to "
             "in Article 2 of Regulation (EU) No 9/2016.\n")
    pages = _nullable_pages(spark, [_row(9, big)])
    mentions = detect_mentions(parse_pages(pages))
    assert mentions.count() >= 1
