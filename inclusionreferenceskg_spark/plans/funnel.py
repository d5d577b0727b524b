"""Materialized curation funnel: stage tables on disk, composition reads
them back.

``queries.corpus_curated`` recomputes the lang / quality / exact-dedup /
near-dup-cluster chains inline — fine for a catalog oracle, but the
production design (SURVEY §7.1 stage F) materializes each stage once and
composes the funnel by SCANNING the stage tables.  This module wires the
funnel through the same ``Catalog`` lineage-manifest machinery as the KG
checkpoint pipeline (plans/checkpoint.py): each stage commits parquet +
manifest, a resumed run skips completed stages, and the final selection
plan contains only parquet scans + key joins — the near-dup CC iteration,
the LSH self-join, and the regex stages never re-run.

At 100 TB this is the difference between an O(stages) one-time cost and
re-running MinHash+CC for every downstream consumer of the curated set.
"""

from __future__ import annotations

import glob
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from inclusionreferenceskg_spark.operators import dedup, textstats
from inclusionreferenceskg_spark.sources.catalog import Catalog


def _docs_fingerprint(sf_dir: str) -> str:
    """Cheap identity of the documents table: file names, sizes, mtimes
    from the directory listing (no data read).  Keying the stage workdir
    on this means regenerating the parquet under an sf_dir can never
    serve stale stage tables — the fingerprint changes, a fresh workdir
    is used, and the old one is abandoned."""
    path = os.path.join(sf_dir, "documents.parquet")
    files = (sorted(glob.glob(os.path.join(path, "*")))
             if os.path.isdir(path) else [path])
    h = hashlib.md5()
    for f in files:
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def funnel_workdir(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"irkg_funnel_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
        f"_{_docs_fingerprint(sf_dir)}")


def run_curation_funnel(spark: SparkSession, sf_dir: str,
                        workdir: str | None = None,
                        resume: bool = True,
                        lang: str = "en",
                        min_quality: float = 0.5,
                        neardup_threshold: float = 0.2) -> DataFrame:
    """documents -> curated doc set, with every stage materialized.

    Returns the same rows as ``queries.corpus_curated`` (same oracle),
    but the returned plan reads the four STAGE TABLES from parquet — the
    expensive chains (near-dup CC, exact-dup groupBy, regex scoring) run
    at most once per corpus fingerprint.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cat = Catalog(workdir or funnel_workdir(sf_dir))

    def stage(name, build):
        if resume and cat.is_complete(name):
            return cat.read(spark, name)
        return cat.write(name, build())

    lang_t = stage("lang", lambda: textstats.lang_id(docs)
                   .select("doc_id", "lang_guess"))
    qual_t = stage("quality", lambda: textstats.quality_scores(docs)
                   .select("doc_id", "quality_score"))
    keep_t = stage("exact_keep", lambda: dedup.exact_duplicates(docs)
                   .select(F.col("keep_doc_id").alias("doc_id")))
    clus_t = stage("neardup_clusters",
                   lambda: dedup.neardup_clusters(
                       docs, threshold=neardup_threshold)
                   .select("doc_id", "canon_id"))

    # composition over materialized stages only: parquet scans + key joins
    return (docs.select("doc_id")
            .join(lang_t, "doc_id")
            .join(qual_t, "doc_id")
            .filter((F.col("lang_guess") == lang)
                    & (F.col("quality_score") >= min_quality))
            .join(keep_t, "doc_id", "left_semi")
            .join(clus_t, "doc_id", "left")
            .filter(F.col("canon_id").isNull()
                    | (F.col("canon_id") == F.col("doc_id")))
            .select("doc_id", "lang_guess", "quality_score")
            .orderBy("doc_id"))
