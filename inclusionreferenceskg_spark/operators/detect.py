"""Stage B/C — reference detection and qualifier building.

``detect_mentions`` is the standalone detector (D1/D2): per-node regex
matching, exploded to one row per mention.

``build_qualifiers`` fuses detection and qualifier resolution (R1–R10) into
one ``mapInPandas`` pass: the resolver's ``that``/``those``/``thereof``
rules depend on the *previous mentions of the same node in reading order*,
so mentions must not be exploded before their qualifiers exist.  Everything
is still narrow — no shuffle until the target join in ``resolve.py``.

Output rows carry denormalized join keys (deepest element type/number, a
same-corpus ``target_url`` when the pattern pins the citing document, or a
``doc_title`` for genuinely cross-document citations) so target resolution
is a plain equi-join.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from inclusionreferenceskg_spark import schema
from inclusionreferenceskg_spark.functions.grammar import detect
from inclusionreferenceskg_spark.functions.qualify import resolve_mentions


def detect_mentions(nodes: DataFrame) -> DataFrame:
    """nodes -> mentions (url, node_id, seq, mention_idx, start, text)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, node_id, seq, content in zip(
                    pdf["url"], pdf["node_id"], pdf["seq"], pdf["content"]):
                for i, m in enumerate(detect(content or "")):
                    out.append((url, node_id, seq, i, m["start"], m["text"]))
            yield pd.DataFrame(
                out, columns=["url", "node_id", "seq", "mention_idx",
                              "start", "text"])

    return nodes.select("url", "node_id", "seq", "content").mapInPandas(
        run, schema.MENTIONS)


def detect_gold_mentions(nodes: DataFrame, gold: DataFrame) -> DataFrame:
    """Gold-standard detection (D3): greedy in-order ``str.find`` of the
    expected mention list over a document's nodes in pre-order
    (``gold_standard_reference_detector.py:34-46``).  The gold list is
    per-url state, so this runs as one ``applyInPandas`` group per url.

    :param gold: (url, seq, text) expected mentions in document order.
    """
    import json as _json

    golds = (gold.groupBy("url")
             .agg(F.to_json(F.array_sort(F.collect_list(
                 F.struct("seq", "text")))).alias("gold_json")))
    src = (nodes.select("url", "node_id", "seq", "content")
           .join(golds, "url", "inner"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        pending = [g["text"] for g in _json.loads(pdf["gold_json"].iloc[0])]
        out = []
        for url, node_id, seq, content in zip(
                pdf["url"], pdf["node_id"], pdf["seq"], pdf["content"]):
            content = content or ""
            offset = 0
            idx = 0
            while pending:
                ind = content.find(pending[0], offset)
                if ind == -1:
                    break
                text = pending.pop(0)
                out.append((url, node_id, seq, idx, ind, text))
                offset = ind + len(text)
                idx += 1
        return pd.DataFrame(out, columns=["url", "node_id", "seq",
                                          "mention_idx", "start", "text"])

    return src.groupBy("url").applyInPandas(run, schema.MENTIONS)


def _qualifier_row_fields(qualifier):
    """Denormalized join keys for one depth-sorted pattern."""
    deep = qualifier[-1]
    target_url = None
    doc_title = None
    for el in qualifier:
        if el.get("ref_url"):
            target_url = el["ref_url"]
            break
    if target_url is None:
        for el in qualifier:
            if el["node_type"] == "Document":
                doc_title = el["title"]
                break
    return deep["node_type"], deep["number"], target_url, doc_title


def build_qualifiers(nodes: DataFrame) -> DataFrame:
    """nodes -> qualifier rows (schema.QUALIFIERS), one per (mention,
    pattern) pair; fused D1+R1–R10."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, doc_rank, node_id, seq, content, path in zip(
                    pdf["url"], pdf["doc_rank"], pdf["node_id"], pdf["seq"],
                    pdf["content"], pdf["path"]):
                mentions = detect(content or "")
                if not mentions:
                    continue
                node_path = [dict(el) for el in path]
                groups = resolve_mentions([m["text"] for m in mentions],
                                          node_path, url)
                for mi, (mention, patterns) in enumerate(zip(mentions, groups)):
                    for qi, qualifier in enumerate(patterns):
                        deep_type, deep_number, target_url, doc_title = \
                            _qualifier_row_fields(qualifier)
                        out.append((url, doc_rank, node_id, seq, mi,
                                    mention["start"], mention["text"], qi,
                                    qualifier, deep_type, deep_number,
                                    target_url, doc_title))
            yield pd.DataFrame(
                out, columns=[f.name for f in schema.QUALIFIERS.fields])

    return nodes.select("url", "doc_rank", "node_id", "seq", "content",
                        "path").mapInPandas(run, schema.QUALIFIERS)
