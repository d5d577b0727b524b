"""Stage C' — target resolution: qualifier patterns -> target nodes.

The Spark re-expression of ``Node.resolve_loose`` called from the qualifier
resolver component (``util/spacy_components.py:9-25``): instead of walking a
shared in-memory tree, we

1. *generate candidates* with an equi-join of qualifier rows against the
   ``nodes`` table on the deepest pattern element — ``(url, node_type,
   number)`` for same-corpus patterns; genuinely cross-document patterns
   first resolve their Document title against the (small, broadcast)
   per-corpus document-title dimension using the reference's lenient
   substring semantics (``node/document.py:17-27``);
2. *confirm* with the vectorized path-subsequence predicate
   (``functions/pathmatch.py``);
3. *pick the first target in document order* — ``targets[0]`` in the
   reference (``spacy_components.py:22-23``) — via ``row_number`` over
   ``(doc_rank, target_url, target_seq)``.

Scale notes: the candidate join shuffles on ``(url, node_type, number)``;
hot keys ("this Regulation" -> one Document row per url) stay bounded per
url, and AQE skew-join splits anything residual.  The title dimension is one
row per document — tiny relative to total nodes — and explicitly broadcast;
at 10^12 pages the lenient containment join would be replaced by an exact
normalized-title equi-join with the lenient pass as a small-side fallback.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from inclusionreferenceskg_spark.functions.pathmatch import path_matches


@pandas_udf(T.BooleanType())
def _path_match_udf(path: pd.Series, qualifier: pd.Series) -> pd.Series:
    return pd.Series([
        path_matches(list(p), list(q)) for p, q in zip(path, qualifier)
    ])


def document_titles(nodes: DataFrame) -> DataFrame:
    """The per-corpus document dimension (one row per page's Document node)."""
    return (nodes
            .filter(F.col("node_type") == "Document")
            .select(F.col("url").alias("resolved_url"),
                    F.col("title").alias("doc_title_actual")))


def resolve_targets(qualifiers: DataFrame, nodes: DataFrame) -> DataFrame:
    """qualifier rows + nodes -> resolved mentions (schema.RESOLVED)."""
    cand = nodes.select(
        F.col("url").alias("target_url"),
        F.col("doc_rank").alias("target_doc_rank"),
        F.col("node_id").alias("target_node_id"),
        F.col("node_type").alias("cand_type"),
        F.col("number").alias("cand_number"),
        F.col("seq").alias("target_seq"),
        F.col("path").alias("cand_path"),
    )

    base_cols = ["url", "node_id", "seq", "mention_idx", "start", "text",
                 "qual_idx", "qualifier", "deep_type", "deep_number"]

    same_corpus = (qualifiers
                   .filter(F.col("target_url").isNotNull())
                   .select(*base_cols,
                           F.col("target_url").alias("join_url")))

    # cross-document patterns: lenient Document-title match against the
    # broadcast title dimension yields candidate urls
    cross_doc = qualifiers.filter(
        F.col("target_url").isNull() & F.col("doc_title").isNotNull())
    lenient = (
        (F.col("doc_title") == F.col("doc_title_actual"))
        | F.lower(F.col("doc_title_actual")).contains(F.lower(F.col("doc_title")))
        | F.lower(F.col("doc_title")).contains(F.lower(F.col("doc_title_actual")))
    )
    cross_with_url = (cross_doc
                      .join(F.broadcast(document_titles(nodes)), lenient,
                            "inner")
                      .select(*base_cols,
                              F.col("resolved_url").alias("join_url")))

    quals = same_corpus.unionByName(cross_with_url)

    doc_level = quals.filter(F.col("deep_type") == "Document").join(
        cand,
        (F.col("join_url") == cand["target_url"])
        & (cand["cand_type"] == F.lit("Document")),
        "inner",
    )
    inner_level = quals.filter(F.col("deep_type") != "Document").join(
        cand,
        (F.col("join_url") == cand["target_url"])
        & (F.col("deep_type") == cand["cand_type"])
        & ((F.col("deep_number") == cand["cand_number"])
           | (F.col("deep_number") == F.lit(-1))),
        "inner",
    )
    joined = doc_level.unionByName(inner_level)

    confirmed = joined.filter(_path_match_udf(F.col("cand_path"),
                                              F.col("qualifier")))

    # first target in document order (the reference keeps only targets[0])
    w = Window.partitionBy("url", "node_id", "mention_idx", "qual_idx") \
        .orderBy("target_doc_rank", "target_url", "target_seq")
    return (confirmed
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("url", "node_id", "seq", "mention_idx", "start", "text",
                    "qual_idx", "target_url", "target_node_id", "target_seq"))
