"""Deterministic synthetic Common-Crawl-style corpus.

Generates EU-regulation-shaped pages (the ``pages`` input table of
BASELINE.json's input_hint) fully deterministically — seeded per ``doc_id``,
no wall-clock, no external data — so correctness checks and benchmarks are
reproducible bit-for-bit.  Generation is distributed (``mapInPandas`` over
the driving table), never a driver-side loop.

Each synthetic document exercises every parser/detector/resolver feature:
chapter/section/article headings, ``1.``/``(1)`` paragraph numbering,
``(a)``..``(ii)`` points, indents, Official-Journal header noise (filtered by
the date-anchored HeaderPreprocessor), footnote blocks, soft hyphens, and a
controlled mix of reference mentions (internal, tight notation, ranges,
this/that/thereof, cross-document by title).
"""

from __future__ import annotations

import datetime
import random
from typing import Iterable, Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("title", T.StringType(), False),
    T.StructField("doc_rank", T.LongType(), False),
])

_SUBJECTS = [
    "The controller", "The processor", "The supervisory authority",
    "The provider", "The member state", "The commission", "The operator",
    "The data subject",
]
_VERBS = [
    ("shall maintain", "a record of processing activities"),
    ("shall notify", "the competent authority"),
    ("shall adopt", "appropriate technical measures"),
    ("shall ensure", "the security of the service"),
    ("may request", "additional information"),
    ("shall not process", "the personal data"),
    ("shall publish", "an annual report"),
    ("shall designate", "a representative"),
]
_POINT_CLAUSES = [
    "processed lawfully and fairly",
    "collected for specified purposes",
    "adequate and relevant",
    "accurate and kept up to date",
    "kept in an identifiable form",
    "secured against unlawful processing",
]


def doc_title(doc_id: int) -> str:
    return f"Regulation (EU) No {doc_id + 1}/2016"


def doc_url(doc_id: int) -> str:
    return f"https://synth.example/reg/{doc_id}"


def _sentence(rng: random.Random, doc_id: int, n_docs: int,
              article: int, with_ref: bool) -> str:
    subj = rng.choice(_SUBJECTS)
    verb, obj = rng.choice(_VERBS)
    sentence = f"{subj} {verb} {obj}"
    if with_ref:
        kind = rng.randrange(6)
        if kind == 0:
            sentence += f" in accordance with Article {rng.randrange(1, 7)}({rng.randrange(1, 4)})"
        elif kind == 1:
            sentence += f" as referred to in paragraph {rng.randrange(1, 3)} of Article {rng.randrange(1, 7)}"
        elif kind == 2:
            sentence += " pursuant to this Regulation"
        elif kind == 3:
            other = (doc_id * 31 + article * 7 + 1) % max(n_docs, 1)
            sentence += f" subject to Article {rng.randrange(1, 7)} of {doc_title(other)}"
        elif kind == 4:
            sentence += f" under Articles {rng.randrange(1, 3)} to {rng.randrange(3, 7)}"
        else:
            sentence += " as set out in this Article"
    return sentence + "."


def make_doc_text(doc_id: int, n_docs: int, filler: str = "",
                  seed: int = 42) -> str:
    """One deterministic EU-style document body."""
    rng = random.Random(f"{seed}:{doc_id}")
    filler_words = (filler or "").split()
    blocks: List[str] = []
    n_chapters = 2
    article_no = 0
    for ch in range(1, n_chapters + 1):
        blocks.append(f"CHAPTER {'I' * ch}")
        blocks.append(f"Chapter heading {ch}")
        # Official-Journal page-header noise, dropped by HeaderPreprocessor
        blocks.append("4.5.2016 L 119/1 Official Journal of the European Union EN")
        for _ in range(3):
            article_no += 1
            blocks.append(f"Article {article_no}")
            blocks.append(f"Subject matter {article_no}")
            for para in range(1, 3):
                lead = _sentence(rng, doc_id, n_docs, article_no,
                                 with_ref=rng.random() < 0.7)
                if filler_words:
                    k = rng.randrange(0, min(8, len(filler_words)))
                    extra = " ".join(filler_words[:k])
                    if extra:
                        lead += " " + extra + "."
                blocks.append(f"{para}. {lead}")
                if para == 1 and article_no % 2 == 0:
                    for p in range(rng.randrange(2, 4)):
                        label = chr(ord("a") + p)
                        blocks.append(
                            f"({label}) {_POINT_CLAUSES[p % len(_POINT_CLAUSES)]};")
                if article_no % 5 == 0 and para == 2:
                    blocks.append("- the first indent item,")
                    blocks.append("- the second indent item;")
    # a soft hyphen to exercise blockize deletion
    blocks.append("Final pro­visions apply from the date of entry into force.")
    return "\n\n".join(blocks)


def synthesize_pages(spark: SparkSession, n_docs: int,
                     seed: int = 42, partitions: int = 0) -> DataFrame:
    """n deterministic pages, generated in parallel."""
    driving = spark.range(n_docs)
    if partitions:
        driving = driving.repartition(partitions)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                text = make_doc_text(doc_id, n_docs, seed=seed)
                rows.append(_page_row(doc_id, text, n_docs))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in PAGES_SCHEMA.fields])

    return driving.mapInPandas(gen, PAGES_SCHEMA)


#: out-links per synthetic page's <nav> block
HTML_FANOUT = 3


def page_out_links(doc_id: int, n_docs: int) -> list:
    """Deterministic hyperlink targets of page ``doc_id`` (self dropped,
    like a real nav bar never linking the current page)."""
    return [t for t in ((doc_id * 31 + 7 + 11 * k) % n_docs
                        for k in range(HTML_FANOUT)) if t != doc_id]


def _page_row(doc_id: int, text: str, n_docs: int = 0) -> Tuple:
    ts = datetime.datetime(2016, 5, 4, tzinfo=datetime.timezone.utc) \
        + datetime.timedelta(seconds=doc_id)
    nav = ""
    if n_docs:
        nav = "<nav>" + "".join(
            f'<a href="{doc_url(t)}">{doc_title(t)}</a>'
            for t in page_out_links(doc_id, n_docs)) + "</nav>"
    html = (f"<html><body>{nav}<pre>{text[:200]}</pre></body></html>"
            .encode("utf-8"))
    lang = "en" if doc_id % 17 else "de"
    return (doc_url(doc_id), ts, html, text, lang, doc_title(doc_id), doc_id)


def pages_from_documents(documents: DataFrame, seed: int = 42) -> DataFrame:
    """Derive the pages table from the harness's ``documents`` table: each
    document row seeds one synthetic EU-style page, with the document's own
    text woven in as paragraph filler (ties results to real input data while
    keeping the structure parseable)."""
    n_docs = documents.count()
    # a small parquet source arrives as 1-2 splits; spread the (expensive)
    # downstream per-page UDF work across the cluster before generating.
    # ~4 tasks per core (not 1): per-page UDF cost varies, and one wave of
    # long tasks quantizes badly — measured 2.2x -> 3.0x two-level speedup
    # from finer granularity.  Floor of ~64 docs/task: shorter tasks pay
    # more in Arrow/scheduling overhead than they gain in wave smoothing
    # (128 parts for 5000 docs at local[32] measured 43% slower than 64).
    spark = documents.sparkSession
    par = spark.sparkContext.defaultParallelism
    documents = documents.repartition(
        max(min(par * 4, max(n_docs // 64, 1)), 8), "doc_id")

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                body = make_doc_text(doc_id, n_docs, filler=text or "",
                                     seed=seed)
                rows.append(_page_row(doc_id, body, n_docs))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in PAGES_SCHEMA.fields])

    return documents.select("doc_id", "text").mapInPandas(gen, PAGES_SCHEMA)
