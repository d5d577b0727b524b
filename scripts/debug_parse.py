"""Dev tool: dump the annotator's parse + extracted phrases for one GDPR
article (default 30), sentence by sentence, for parser iteration against
the golden triples (kg_triplets/*.csv)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from inclusionreferenceskg_spark.functions.annotate import annotate_text
from inclusionreferenceskg_spark.functions.doctree import parse_page
from inclusionreferenceskg_spark.functions.grammar import detect
from inclusionreferenceskg_spark.functions.phrases import PhraseExtractor

REF = "/root/reference/inclusionreferenceskg"


def phrase_str(p, depth=0):
    pad = "  " * depth
    out = []
    preds = ",".join(t.token.text for t in p.predicate)
    out.append(f"{pad}PRED[{preds}]")
    for o in p.agent_objects:
        out.append(f"{pad}  agent: {o.token.text}")
    for o in p.patient_objects:
        out.append(f"{pad}  patient: {o.token.text}")
    for sp in p.agent_phrases:
        out.append(f"{pad}  agent-phrase:")
        out.append(phrase_str(sp, depth + 2))
    for sp in p.patient_phrases:
        out.append(f"{pad}  patient-phrase:")
        out.append(phrase_str(sp, depth + 2))
    for sp in p.condition_phrases:
        out.append(f"{pad}  cond-phrase:")
        out.append(phrase_str(sp, depth + 2))
    return "\n".join(out)


def main(article_no=30, sent_filter=None, show_tokens=True):
    with open(f"{REF}/resources/eu_documents/gdpr.txt", encoding="utf-8") as f:
        text = f.read()
    rows = parse_page("eu://gdpr.txt", "GDPR", text)
    sub = [r for r in rows
           if any(el["node_type"] == "Article" and el["number"] == article_no
                  for el in r["path"])]
    parts, pos, doc_mentions = [], 0, []
    for row in sub:
        content = row["content"] or ""
        for m in detect(content):
            doc_mentions.append({"start": pos + m["start"], "text": m["text"],
                                 "targets": []})
        parts.append(content + "\n")
        pos += len(content) + 1
    raw = "".join(parts)
    sents = annotate_text(raw, doc_mentions)
    ex = PhraseExtractor()
    for si, sent in enumerate(sents):
        if sent_filter is not None and si != sent_filter:
            continue
        print(f"\n=== SENT {si}: {' '.join(t.text for t in sent)[:160]}")
        if show_tokens:
            for t in sent:
                print(f"  {t.i:3d} {t.text[:28]:28s} {t.pos:6s} {t.tag:5s} "
                      f"{t.dep:10s} head={t.head.i if t.head is not None else -1:3d}"
                      f" {'REF' if t.tag == 'REF' else ''}")
        for p in ex.extract_from_sentence(sent, False):
            print(phrase_str(p, 1))


if __name__ == "__main__":
    art = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf = int(sys.argv[2]) if len(sys.argv) > 2 else None
    main(art, sf)
