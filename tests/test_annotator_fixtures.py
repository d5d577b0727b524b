"""Per-sentence annotator goldens for GDPR Articles 29/30.

The E4 adjusted-1.0 gate (EVAL_LEDGER.md) rests on specific dependency
attachments in these articles — e.g. "employing" parsed as an acl on
"organisation" rather than a conditional of "apply".  These tests replay
the annotator over every pinned sentence and compare token text / pos /
dep / head / coref exactly, so an annotator change that silently flips an
attachment fails HERE, by node name, instead of surfacing as E4 drift.

Regenerate after an INTENTIONAL change with
``python scripts/pin_annotator_fixtures.py`` (then re-run
``scripts/eval_kg_triples.py`` and commit fixture + ledger together).
"""

from __future__ import annotations

import json
import os

import pytest

from inclusionreferenceskg_spark.functions.annotate import annotate_text
from inclusionreferenceskg_spark.functions.grammar import detect

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "fixtures", "annotator_gdpr_29_30.json")

with open(FIXTURE, encoding="utf-8") as f:
    _FIXTURE = json.load(f)


def _annotate(content):
    mentions = detect(content)
    for m in mentions:
        m["targets"] = []
    return annotate_text(content, mentions)


def _tok_row(t):
    return {
        "text": t.text,
        "pos": t.pos,
        "tag": getattr(t, "tag", None),
        "dep": t.dep,
        "head": t.head.text if t.head is not None and t.head is not t
                else None,
        "coref": sorted(t.coref) if getattr(t, "coref", None) else None,
    }


@pytest.mark.parametrize("key", sorted(_FIXTURE))
def test_pinned_sentence_parse(key):
    node = _FIXTURE[key]
    sents = _annotate(node["content"])
    assert len(sents) == len(node["sentences"]), (
        f"{key}: sentence split changed "
        f"({len(sents)} vs pinned {len(node['sentences'])})")
    for pinned, sent in zip(node["sentences"], sents):
        got = [_tok_row(t) for t in sent]
        want = pinned["tokens"]
        assert len(got) == len(want), (
            f"{key} sent {pinned['sent']}: token count changed")
        for i, (g, w) in enumerate(zip(got, want)):
            assert g == w, (
                f"{key} sent {pinned['sent']} token {i} ({w['text']!r}): "
                f"pinned {w} != got {g}")


def test_fixture_covers_ledger_attachments():
    """The load-bearing attachments cited in EVAL_LEDGER.md must be
    present in the pinned fixture (guards against regenerating a fixture
    from a broken annotator and calling it golden)."""
    # "employing" must be an acl (not a conditional advcl) — ledger's
    # FN `apply,conditional,employing` justification
    emp = _find_token("employing")
    assert emp["dep"] == "acl" and emp["head"] == "organisation", emp
    # the relcl "carries" with zero relativizer (Article 30(5) sentence)
    car = _find_token("carries")
    assert car["dep"] == "relcl" and car["head"] == "processing", car


def _find_token(text):
    for node in _FIXTURE.values():
        for sent in node["sentences"]:
            for t in sent["tokens"]:
                if t["text"] == text:
                    return t
    raise AssertionError(f"token {text!r} not in fixture")


def test_perturbation_detected():
    """The comparison is live: a seeded single-attachment flip fails."""
    key = sorted(_FIXTURE)[0]
    node = _FIXTURE[key]
    sents = _annotate(node["content"])
    got = [_tok_row(t) for t in sents[0]]
    perturbed = [dict(r) for r in node["sentences"][0]["tokens"]]
    # flip one token's dep
    perturbed[0]["dep"] = "__seeded_fault__"
    assert got != perturbed
