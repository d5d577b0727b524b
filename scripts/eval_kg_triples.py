"""Dev tool: E4 triple evaluation vs the reference's golden CSVs.

Replicates ``evaluate_kg_creation.py``: per-article graphs over GDPR
Articles 29/30 (``create_graph(article, article)`` — note the reference
resolves references against the *article itself*, so fully-qualified
patterns never match and no edge rerouting happens in this evaluation),
entity linking L1/L2/L4, batched merge, then set comparison of
``(subject, relation, object)`` strings excluding defines/contains.

Pure-Python twin of the Spark operators for fast annotator iteration; the
Spark path is exercised by tests/test_spark_kg.py on the synthetic corpus.
"""

from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from inclusionreferenceskg_spark.functions.doctree import parse_page
from inclusionreferenceskg_spark.functions.grammar import detect
from inclusionreferenceskg_spark.functions.kgbuild import render_document

REF = "/root/reference/inclusionreferenceskg"


def article_subtree(rows, article_no):
    out = []
    for r in rows:
        if any(el["node_type"] == "Article" and el["number"] == article_no
               for el in r["path"]):
            out.append(r)
    return out


def build_graph_rows(sub_rows):
    mentions_by_node = {}
    for node in sub_rows:
        ms = detect(node["content"] or "")
        for m in ms:
            m["targets"] = []
        mentions_by_node[node["node_id"]] = ms
    out = render_document(sub_rows[0]["url"], sub_rows, mentions_by_node)
    kg_nodes = {r["kg_id"]: r for r in out["kg_nodes"]}
    return kg_nodes, out["kg_edges"]


def link_and_merge(kg_nodes, edges, node_display):
    groups = defaultdict(list)
    for r in kg_nodes.values():
        groups[("L1", r["token_key"])].append(r["kg_id"])
        if r["kind"] == "object" and r["para_key"]:
            groups[("L2", r["para_key"], r["coref_lemma"],
                    r["coref_tag"])].append(r["kg_id"])
        if r["propn_key"]:
            groups[("L4", r["url"], r["propn_key"])].append(r["kg_id"])

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for members in groups.values():
        for m in members[1:]:
            union(members[0], m)

    def canon(x):
        return find(x) if x in parent else x

    final = {}
    for e in edges:
        s, d = canon(e["src"]), canon(e["dst"])
        if s == d:
            continue
        final[(s, d)] = e["label"]

    def display(kg_id):
        if kg_id in kg_nodes:
            return kg_nodes[kg_id]["token_text"]
        return node_display.get(kg_id, kg_id)

    return {(display(s), lab, display(d)) for (s, d), lab in final.items()
            if lab not in ("defines", "contains")}


def evaluate(article_no, csv_name, verbose=True):
    if not hasattr(evaluate, "last"):
        evaluate.last = {}
    with open(os.path.join(REF, "resources", "eu_documents", "gdpr.txt"),
              encoding="utf-8") as f:
        text = f.read()
    rows = parse_page("eu://gdpr.txt", "GDPR", text)
    node_display = {
        r["node_id"]: f"{r['node_type']} {r['number']}"
        + (f": {r['title']}" if r["title"] else "")
        for r in rows
    }
    sub = article_subtree(rows, article_no)
    kg_nodes, edges = build_graph_rows(sub)
    actual = link_and_merge(kg_nodes, edges, node_display)

    with open(os.path.join(REF, "resources", "evaluation_data",
                           "kg_triplets", csv_name), encoding="utf-8") as f:
        expected = {tuple(x) for x in csv.reader(f)}

    fp = actual - expected
    fn = expected - actual
    evaluate.last[article_no] = {"fp": sorted(fp), "fn": sorted(fn)}
    if verbose:
        for t in sorted(fp):
            print("  FP", t)
        for t in sorted(fn):
            print("  FN", t)
    tp = len(actual & expected)
    p = tp / len(actual) if actual else 0.0
    r = tp / len(expected) if expected else 0.0
    print(f"Article {article_no}: P={p:.3f} R={r:.3f} "
          f"({tp} tp, {len(fp)} fp, {len(fn)} fn)")
    return tp, len(fp), len(fn)


def load_ledger(path="/root/repo/EVAL_LEDGER.md"):
    """Parse EVAL_LEDGER.md table rows -> {(kind, subj, rel, obj): class}.

    Only rows whose class marks them as gold-side (see the ledger header)
    are excluded from the adjusted score; the ledger is the committed,
    row-by-row justification the adjusted number rests on."""
    import re
    ledgered = {}
    if not os.path.exists(path):
        return ledgered
    with open(path, encoding="utf-8") as f:
        for line in f:
            m = re.match(
                r"\|\s*(FP|FN)\s*\|\s*([^|]+?)\s*\|\s*([^|]+?)\s*\|"
                r"\s*([^|]+?)\s*\|\s*([a-z-]+)\s*\|", line)
            if m:
                kind, s, rel, o, cls = m.groups()
                ledgered[(kind, s, rel, o)] = cls
    return ledgered


if __name__ == "__main__":
    verbose = "-q" not in sys.argv
    ledger = load_ledger()
    tp1, fp1, fn1 = evaluate(29, "gdpr_article_29.csv", verbose)
    tp2, fp2, fn2 = evaluate(30, "gdpr_article_30.csv", verbose)
    tp, fp, fn = tp1 + tp2, fp1 + fp2, fn1 + fn2
    p = tp / (tp + fp) if tp + fp else 0
    r = tp / (tp + fn) if tp + fn else 0
    f1 = 2 * p * r / (p + r) if p + r else 0
    print(f"TOTAL: P={p:.3f} R={r:.3f} F1={f1:.3f}")

    # adjusted score: residual rows justified row-by-row in EVAL_LEDGER.md
    # as gold-side (product-omission / number-slip / twin-inconsistency /
    # malformed-row / structurally-unreachable) are excluded; any residual
    # NOT in the ledger still counts against us.
    unledgered_fp, unledgered_fn = [], []
    for art, csv_name in ((29, "gdpr_article_29.csv"),
                          (30, "gdpr_article_30.csv")):
        res = evaluate.last[art]
        for t in res["fp"]:
            key = ("FP",) + tuple(str(x) for x in t)[:3]
            if key not in ledger:
                unledgered_fp.append(t)
        for t in res["fn"]:
            # 4-field malformed rows: match on first 3 fields + kind
            key = ("FN",) + tuple(str(x) for x in t)[:3]
            key4 = ("FN", t[0], t[1], t[2] + ",") if len(t) == 4 else None
            if key not in ledger and (key4 is None or key4 not in ledger):
                unledgered_fn.append(t)
    afp, afn = len(unledgered_fp), len(unledgered_fn)
    ap = tp / (tp + afp) if tp + afp else 0
    ar = tp / (tp + afn) if tp + afn else 0
    af1 = 2 * ap * ar / (ap + ar) if ap + ar else 0
    print(f"ADJUSTED (EVAL_LEDGER.md, {len(ledger)} rows ledgered, "
          f"{afp} fp / {afn} fn unledgered): "
          f"P={ap:.3f} R={ar:.3f} F1={af1:.3f}")
    for t in unledgered_fp:
        print("  UNLEDGERED FP", t)
    for t in unledgered_fn:
        print("  UNLEDGERED FN", t)
