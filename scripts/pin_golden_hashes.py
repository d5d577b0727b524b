"""Dev-only script: pin golden extracted-text hashes.

Runs the REFERENCE parser (pure-Python modules, no spaCy needed) on the
reference's own EU-document corpus to compute the expected per-url
``sha256(pre-order content + "\\n" concatenation)``, then runs OUR parser and
verifies byte identity before writing ``tests/golden_hashes.json``.

This is the one sanctioned touchpoint with reference *code*: it is executed
at development time only, to produce an oracle fixture; nothing from the
reference is imported at library runtime.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REF = "/root/reference/inclusionreferenceskg"
sys.path.insert(0, os.path.join(REF, "src"))

from document_parsing.document_tree_parser import DocumentTreeParser  # noqa: E402
from document_parsing.preprocessing.footnote_delete_preprocessor import (  # noqa: E402
    FootnoteDeletePreprocessor,
)
from document_parsing.preprocessing.header_preprocessor import (  # noqa: E402
    HeaderPreprocessor,
)

sys.path.insert(0, "/root/repo")
from inclusionreferenceskg_spark.functions.doctree import (  # noqa: E402
    extracted_text,
    parse_page,
)

# (title, file) pairs as registered in util/parser_util.py:8-48
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


def pre_order(root):
    # local copy of the traversal (node_traversal.py pulls in spaCy)
    stack = [root]
    while stack:
        cur = stack.pop()
        stack.extend(cur.children[::-1])
        yield cur


def sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def main() -> None:
    out = {}
    mismatches = 0
    for chain_name, parser in (
        ("default", DocumentTreeParser()),
        ("detector_eval",
         DocumentTreeParser(preprocessors=[HeaderPreprocessor,
                                           FootnoteDeletePreprocessor])),
    ):
        ours_chain = ("header", "initial_space", "footnote_append") \
            if chain_name == "default" else ("header", "footnote_delete")
        for title, fname in CORPUS:
            path = os.path.join(REF, "resources", "eu_documents", fname)
            with open(path, encoding="utf-8") as f:
                text = f.read()
            ref_doc = parser.parse_document(title, text)
            ref_extracted = "".join((n.content or "") + "\n"
                                    for n in pre_order(ref_doc))
            ref_node_count = sum(1 for _ in pre_order(ref_doc))

            rows = parse_page(f"eu://{fname}", title, text, ours_chain)
            ours_extracted = extracted_text(rows)

            ok = ref_extracted == ours_extracted and ref_node_count == len(rows)
            if not ok:
                mismatches += 1
                print(f"MISMATCH [{chain_name}] {fname}: "
                      f"ref_nodes={ref_node_count} ours={len(rows)} "
                      f"text_eq={ref_extracted == ours_extracted}")
                # locate first divergence
                for i, (a, b) in enumerate(zip(ref_extracted, ours_extracted)):
                    if a != b:
                        print(f"  first diff at char {i}: "
                              f"{ref_extracted[i-50:i+50]!r} vs "
                              f"{ours_extracted[i-50:i+50]!r}")
                        break
            out[f"{chain_name}:{fname}"] = {
                "title": title,
                "sha256": sha(ref_extracted),
                "node_count": ref_node_count,
                "chars": len(ref_extracted),
            }
    if mismatches:
        print(f"{mismatches} mismatches — NOT writing fixture")
        sys.exit(1)
    with open("/root/repo/tests/golden_hashes.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} golden hashes; all byte-identical")


if __name__ == "__main__":
    main()
