"""Stage A — structural parse: pages -> nodes (+ extracted text).

Spark shape: one input row is one document, so the reference's sequential
stack-machine parse (``document_tree_parser.py:44-81``) runs whole inside an
Arrow-batched ``mapInPandas`` and parallelism is across pages — a narrow
transformation with zero shuffle.  Column pruning matters: only
``(url, title, doc_rank, text)`` are sent to Python; ``html`` never leaves
the scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from inclusionreferenceskg_spark import schema
from inclusionreferenceskg_spark.functions.blocks import DEFAULT_CHAIN
from inclusionreferenceskg_spark.functions.doctree import (
    extracted_text as _extracted_text,
    parse_page,
)


def _with_engine_columns(pages: DataFrame) -> DataFrame:
    """Default the optional ``title``/``doc_rank`` metadata columns."""
    cols = set(pages.columns)
    if "title" not in cols:
        pages = pages.withColumn("title", F.col("url"))
    if "doc_rank" not in cols:
        pages = pages.withColumn("doc_rank", F.xxhash64("url"))
    return pages


def parse_pages(pages: DataFrame,
                chain: Tuple[str, ...] = DEFAULT_CHAIN) -> DataFrame:
    """pages(url, text[, title, doc_rank]) -> nodes table (schema.NODES)."""
    pages = _with_engine_columns(pages)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, title, doc_rank, text in zip(
                    pdf["url"], pdf["title"], pdf["doc_rank"], pdf["text"]):
                for row in parse_page(url, title, text or "", chain):
                    row["doc_rank"] = int(doc_rank)
                    out.append(row)
            yield pd.DataFrame(
                out, columns=[f.name for f in schema.NODES.fields])

    return pages.select("url", "title", "doc_rank", "text").mapInPandas(
        run, schema.NODES)


def extract_text(pages: DataFrame,
                 chain: Tuple[str, ...] = DEFAULT_CHAIN) -> DataFrame:
    """pages -> per-url extracted text + sha256 (the byte-identity artifact,
    ``kg_renderer.py:151-159``) in a single shuffle-free pass."""
    pages = _with_engine_columns(pages)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, texts, digests = [], [], []
            for url, title, text in zip(pdf["url"], pdf["title"], pdf["text"]):
                extracted = _extracted_text(parse_page(url, title, text or "",
                                                       chain))
                urls.append(url)
                texts.append(extracted)
                digests.append(
                    hashlib.sha256(extracted.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"url": urls, "text": texts, "sha256": digests})

    return pages.select("url", "title", "text").mapInPandas(
        run, schema.EXTRACTED_TEXT)


def extracted_text_from_nodes(nodes: DataFrame) -> DataFrame:
    """Relational variant over an existing nodes table: pre-order
    ``content + "\\n"`` concat per url.  One shuffle on url (bucketing the
    nodes table by url makes it shuffle-free)."""
    ordered = F.array_sort(F.collect_list(F.struct("seq", "content")))
    text = F.concat_ws(
        "", F.transform(ordered,
                        lambda s: F.concat(F.coalesce(s["content"], F.lit("")),
                                           F.lit("\n"))))
    return (nodes.groupBy("url")
            .agg(text.alias("text"))
            .withColumn("sha256", F.sha2(F.col("text"), 256)))
