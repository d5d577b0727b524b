"""Pin per-sentence annotator goldens for GDPR Articles 29/30.

The E4 adjusted-1.0 claim rests on specific dependency attachments in
these two articles (EVAL_LEDGER.md — e.g. the acl-vs-conditional parse of
"employing").  This script snapshots the annotator's token/head/dep output
for every sentence of both articles into
``tests/fixtures/annotator_gdpr_29_30.json``; ``tests/test_annotator_
fixtures.py`` replays the annotator against the snapshot so any change
that silently flips an attachment fails a NAMED per-sentence test instead
of surfacing as E4 drift.

Run after an intentional annotator change, inspect the diff, re-run the
E4 gate (scripts/eval_kg_triples.py), then commit both together.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from inclusionreferenceskg_spark.functions.annotate import annotate_text
from inclusionreferenceskg_spark.functions.doctree import parse_page
from inclusionreferenceskg_spark.functions.grammar import detect

REF = "/root/reference/inclusionreferenceskg"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "annotator_gdpr_29_30.json")


def article_nodes(rows, article_no):
    return [r for r in rows
            if any(el["node_type"] == "Article"
                   and el["number"] == article_no for el in r["path"])]


def snapshot_node(node):
    """Annotate one node's content exactly as the KG path does (detected
    mentions fed through the REF-token adapter) -> sentence token rows."""
    content = node["content"] or ""
    mentions = detect(content)
    for m in mentions:
        m["targets"] = []
    sents = annotate_text(content, mentions)
    out = []
    for si, sent in enumerate(sents):
        toks = []
        for t in sent:
            toks.append({
                "text": t.text,
                "pos": t.pos,
                "tag": getattr(t, "tag", None),
                "dep": t.dep,
                "head": t.head.text if t.head is not None
                        and t.head is not t else None,
                "coref": sorted(t.coref) if getattr(t, "coref", None)
                         else None,
            })
        out.append({"sent": si, "tokens": toks})
    return out


def main():
    with open(os.path.join(REF, "resources", "eu_documents", "gdpr.txt"),
              encoding="utf-8") as f:
        text = f.read()
    rows = parse_page("eu://gdpr.txt", "GDPR", text)
    fixture = {}
    for art in (29, 30):
        for node in article_nodes(rows, art):
            if not (node["content"] or "").strip():
                continue
            key = f"art{art}:{node['node_type']}:{node['number']}" \
                  f":{node['node_id'][:12]}"
            fixture[key] = {
                "article": art,
                "node_type": node["node_type"],
                "number": node["number"],
                "content": node["content"],
                "sentences": snapshot_node(node),
            }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    n_sents = sum(len(v["sentences"]) for v in fixture.values())
    n_toks = sum(len(s["tokens"]) for v in fixture.values()
                 for s in v["sentences"])
    print(f"pinned {len(fixture)} nodes / {n_sents} sentences / "
          f"{n_toks} tokens -> {OUT}")


if __name__ == "__main__":
    main()
