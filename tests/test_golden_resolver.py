"""Resolver end-to-end eval vs the reference's ``gdpr_resolved.json``.

Mirrors ``evaluate_reference_resolver.py``: gold-standard mention detection
(greedy in-order find over the gold CSV,
``gold_standard_reference_detector.py:34-46``), per-node qualifier building
(``qualify.resolve_mentions``), target lookup over the full 12-document
corpus (``pathmatch.path_matches`` — the pure-Python core of the Spark Q1
join, candidates pre-filtered by the deepest pattern element exactly like the
DataFrame equi-join), and the recursive pattern validator
(``evaluate_reference_resolver.py:99-125``).
"""

from __future__ import annotations

import csv
import json
import os

import pytest

from inclusionreferenceskg_spark.functions.doctree import parse_page
from inclusionreferenceskg_spark.functions.pathmatch import path_matches
from inclusionreferenceskg_spark.functions.qualify import resolve_mentions

REF = "/root/reference/inclusionreferenceskg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not available")

CORPUS = [
    ("GDPR", "gdpr.txt"),
    ("TEU", "teu.txt"),
    ("Directive 95/46/EC", "directive_95_46_ec.txt"),
    ("Directive 2000/31/EC", "directive_2000_31_EC.txt"),
    ("Directive (EU) 2015/1535", "directive_eu_2015_1535.txt"),
    ("EN-ISO/IEC 17065/2012", "mock_en_iso_17065_2012.txt"),
    ("Regulation (EC) No 45/2001", "regulation_ec_45_2001.txt"),
    ("Regulation (EU) No 182/2011", "regulation_eu_182_2011.txt"),
    ("Regulation (EC) No 765/2008", "regulation_ev_765_2008.txt"),
    ("Directive 2002/58/EC", "directive_2002_58_EC.txt"),
    ("Regulation (EC) No 1049/2001", "regulation_ec_1049_2001.txt"),
    ("Regulation (EEC) No 339/93", "regulation_eec_339_93.txt"),
]


def _parse_corpus():
    all_rows = []
    for rank, (title, fname) in enumerate(CORPUS):
        with open(os.path.join(REF, "resources", "eu_documents", fname),
                  encoding="utf-8") as f:
            text = f.read()
        rows = parse_page(f"eu://{fname}", title, text)
        for r in rows:
            r["doc_rank"] = rank
        all_rows.extend(rows)
    return all_rows


def _candidates_index(rows):
    by_type_number = {}
    for r in rows:
        by_type_number.setdefault((r["node_type"], r["number"]), []).append(r)
    docs = [r for r in rows if r["node_type"] == "Document"]
    return by_type_number, docs


def resolve_targets(pattern, index):
    """Candidate generation + confirm — the in-memory twin of the Spark join:
    equi-match on the deepest element's (type, number), then path filter,
    then document order."""
    by_type_number, docs = index
    deepest = pattern[-1]
    if deepest["node_type"] == "Document":
        cands = docs
    elif deepest.get("number") == -1:
        cands = [r for rs in by_type_number.items()
                 if rs[0][0] == deepest["node_type"] for r in rs[1]]
    else:
        cands = by_type_number.get((deepest["node_type"], deepest["number"]), [])
    hits = [r for r in cands if path_matches(r["path"], pattern)]
    hits.sort(key=lambda r: (r["doc_rank"], r["seq"]))
    return hits


def validate(node, pattern, children_of):
    """Recursive pattern validator (evaluate_reference_resolver.py:99-125)."""
    if pattern.get("title") and pattern["title"] != node["title"]:
        return False
    if pattern.get("number") and pattern["number"] != node["number"]:
        return False
    if pattern.get("type") and \
            pattern["type"].lower() != node["node_type"].lower():
        return False
    if pattern.get("starts_with") and not (node["content"] or "").lower() \
            .replace(" ", "").startswith(
                pattern["starts_with"].lower().replace(" ", "")):
        return False
    if pattern.get("has_child") and not any(
            validate(c, pattern["has_child"], children_of)
            for c in children_of.get(node["node_id"], [])):
        return False
    return True


def test_resolver_quality_vs_gold():
    rows = _parse_corpus()
    index = _candidates_index(rows)
    children_of = {}
    for r in rows:
        if r["parent_id"] is not None:
            children_of.setdefault(r["parent_id"], []).append(r)

    with open(os.path.join(REF, "resources", "evaluation_data",
                           "gdpr_references.csv"), encoding="utf-8") as f:
        gold_refs = [row[0] for row in csv.reader(f, delimiter=";")][1:]
    with open(os.path.join(REF, "resources", "evaluation_data",
                           "gdpr_resolved.json"), encoding="utf-8") as f:
        expected = json.load(f)

    # gold-standard greedy detection per node, in pre-order over the GDPR
    gdpr_rows = [r for r in rows if r["url"] == "eu://gdpr.txt"]
    actual = []  # (mention text, [qualifier patterns])
    pending = list(gold_refs)
    for node in gdpr_rows:
        content = node["content"] or ""
        mentions = []
        offset = 0
        while pending:
            ind = content.find(pending[0], offset)
            if ind == -1:
                break
            mentions.append(pending.pop(0))
            offset = ind + len(mentions[-1])
        if mentions:
            quals = resolve_mentions(mentions, node["path"], node["url"])
            actual.extend(zip(mentions, quals))

    assert len(actual) == len(gold_refs) == 663

    n_expected = sum(len(e["patterns"]) for e in expected)
    fp = fn = n_detected = 0
    for (text, qualifiers), exp in zip(actual, expected):
        n_detected += len(qualifiers)
        assert text == exp["text"], (text, exp["text"])
        if not qualifiers:
            fn += len(exp["patterns"])
            continue
        resolved = []
        unresolvable = False
        for pattern in qualifiers:
            hits = resolve_targets(pattern, index)
            if not hits:
                fn += len(exp["patterns"])
                unresolvable = True
                continue
            if len(hits) > 1:
                fp += len(hits)
                fn += len(exp["patterns"])
            resolved.append(hits[0])
        if unresolvable:
            continue
        if len(exp["patterns"]) != len(resolved):
            fp += len(resolved)
            fn += len(exp["patterns"])
            continue
        for pat, node in zip(exp["patterns"], resolved):
            if not validate(node, pat, children_of):
                fn += 1
                fp += 1

    precision = (n_detected - fp) / n_detected
    recall = (n_expected - fn) / n_expected
    # measured: P=0.9989 R=0.9978 (1 FP, 2 FN over 906 gold patterns)
    assert precision >= 0.99, (precision, recall, fp, fn, n_detected, n_expected)
    assert recall >= 0.99, (precision, recall, fp, fn, n_detected, n_expected)
