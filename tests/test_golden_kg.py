"""E4 golden-triple quality tracking vs the reference's evaluation set.

Runs the pure-Python twin of the KG stages (scripts/eval_kg_triples.py) on
GDPR Articles 29+30 and asserts the current quality floor.  The 0.95 target
(BASELINE.json) requires closing the remaining gap between the rule-based
annotator and spaCy's parser — tracked round over round; the floor below is
the measured level at the time of writing and must never regress.
"""

from __future__ import annotations

import os
import sys

import pytest

REF = "/root/reference/inclusionreferenceskg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not available")


def test_kg_triples_floor():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import eval_kg_triples as ev

    tp1, fp1, fn1 = ev.evaluate(29, "gdpr_article_29.csv", verbose=False)
    tp2, fp2, fn2 = ev.evaluate(30, "gdpr_article_30.csv", verbose=False)
    tp, fp, fn = tp1 + tp2, fp1 + fp2, fn1 + fn2
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    # measured r1: P=0.602 R=0.849 F1=0.705 (the golden CSV is hand-authored
    # — the reference itself does not score 1.0 on it: most residual FPs are
    # rows the reference's own pred-x-object product emits but the CSV
    # omits, and several FNs are display strings absent from the text)
    assert precision >= 0.58, (precision, recall)
    assert recall >= 0.82, (precision, recall)
