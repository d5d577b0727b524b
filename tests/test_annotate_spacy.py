"""The spaCy adapter: dispatcher contract + Doc->Tok mapping.

spaCy itself is not installable in this sandbox, so the mapping is
exercised with a duck-typed stub doc; the real-model tests are
importorskip-gated and run wherever a deployment image carries
en_core_web_sm (reference kg_renderer.py:201-232).
"""

import os

import pytest

from inclusionreferenceskg_spark.functions import annotate_spacy as asp
from inclusionreferenceskg_spark.functions.annotate import annotate_text
from inclusionreferenceskg_spark.functions.phrases import PhraseExtractor


# --- stub doc (duck-typed spaCy read surface) -------------------------------

class _Ext:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _StubTok:
    def __init__(self, i, text, lemma, pos, tag, dep, head_i, idx,
                 is_ref=False, ref_targets=None):
        self.i, self.text, self.lemma_ = i, text, lemma
        self.pos_, self.tag_, self.dep_ = pos, tag, dep
        self._head_i, self.idx = head_i, idx
        self._ = _Ext(is_ref=is_ref, ref_targets=ref_targets)
        self.doc = None

    @property
    def head(self):
        return self.doc[self._head_i]


class _StubChains:
    """coreferee-shaped: resolve(token) -> antecedent tokens or None."""

    def __init__(self, mapping):
        self.mapping = mapping

    def resolve(self, tok):
        return self.mapping.get(tok.i)


class _StubDoc:
    def __init__(self, sent_specs, coref=None):
        self.toks = []
        self._sent_bounds = []
        for spec in sent_specs:
            start = len(self.toks)
            for row in spec:
                self.toks.append(_StubTok(len(self.toks), *row))
            self._sent_bounds.append((start, len(self.toks)))
        for t in self.toks:
            t.doc = self.toks
        self._ = _Ext(coref_chains=None)
        if coref:
            self._.coref_chains = _StubChains(
                {i: [self.toks[j] for j in ants] for i, ants in coref.items()})

    @property
    def sents(self):
        return [self.toks[a:b] for a, b in self._sent_bounds]

    def __getitem__(self, i):
        return self.toks[i]

    def __iter__(self):
        return iter(self.toks)


def _doc_controller_shall_maintain():
    # "The controller shall maintain a record . It covers Article 30 ."
    # (second sentence exercises coref + a merged REF token)
    s1 = [
        # text lemma pos tag dep head_i idx
        ("The", "the", "DET", "DT", "det", 1, 0),
        ("controller", "controller", "NOUN", "NN", "nsubj", 3, 4),
        ("shall", "shall", "AUX", "MD", "aux", 3, 15),
        ("maintain", "maintain", "VERB", "VB", "ROOT", 3, 21),
        ("a", "a", "DET", "DT", "det", 5, 30),
        ("record", "record", "NOUN", "NN", "dobj", 3, 32),
        (".", ".", "PUNCT", ".", "punct", 3, 38),
    ]
    s2 = [
        ("It", "it", "PRON", "PRP", "nsubj", 8, 40),
        ("covers", "cover", "VERB", "VBZ", "ROOT", 8, 43),
        ("Article 30", "Article 30", "PROPN", "REF", "dobj", 8, 50, True,
         [{"node_id": "n30", "url": "u", "seq": 30}]),
        (".", ".", "PUNCT", ".", "punct", 8, 60),
    ]
    return _StubDoc([s1, s2], coref={7: [1]})  # "It" -> "controller"


def test_doc_to_sents_maps_surface_and_extensions():
    sents = asp.doc_to_sents(_doc_controller_shall_maintain())
    assert len(sents) == 2
    doc = [t for s in sents for t in s]
    maintain = doc[3]
    assert (maintain.text, maintain.lemma, maintain.pos) == (
        "maintain", "maintain", "VERB")
    assert maintain.head_i == 3  # spaCy root (head==self) maps 1:1
    assert {c.text for c in maintain.children} == {
        "controller", "shall", "record", "."}
    ref = doc[9]
    assert ref.is_ref and ref.tag == "REF" and ref.pos == "PROPN"
    assert ref.ref_targets == [{"node_id": "n30", "url": "u", "seq": 30}]
    # coreferee chain became the rule annotator's antecedent-index list
    assert doc[7].coref == [1]


def test_mapped_doc_feeds_the_phrase_extractor():
    sents = asp.doc_to_sents(_doc_controller_shall_maintain())
    phrases = PhraseExtractor(id_prefix="t:").extract_from_sentence(sents[0])
    assert len(phrases) == 1
    ph = phrases[0]
    assert [p.token.lemma for p in ph.predicate] == ["maintain"]
    assert [o.token.text for o in ph.agent_objects] == ["controller"]
    assert [o.token.text for o in ph.patient_objects] == ["record"]


def test_dispatcher_defaults_to_rule_annotator(monkeypatch):
    monkeypatch.delenv("IRKG_ANNOTATOR", raising=False)
    assert asp.get_annotator() is annotate_text
    monkeypatch.setenv("IRKG_ANNOTATOR", "rule")
    assert asp.get_annotator() is annotate_text


def test_dispatcher_auto_falls_back_without_spacy(monkeypatch):
    monkeypatch.setenv("IRKG_ANNOTATOR", "auto")
    if asp.available():  # pragma: no cover - deployment image
        assert asp.get_annotator() is asp.annotate_text_spacy
    else:
        assert asp.get_annotator() is annotate_text


def test_dispatcher_spacy_is_a_hard_error_when_missing(monkeypatch):
    if asp.available():  # pragma: no cover - deployment image
        pytest.skip("spaCy present: hard-error path not reachable")
    monkeypatch.setenv("IRKG_ANNOTATOR", "spacy")
    with pytest.raises(RuntimeError, match="spaCy"):
        asp.get_annotator()


# --- real-model parity (runs only on a deployment image) --------------------


def test_spacy_annotator_end_to_end():  # pragma: no cover
    pytest.importorskip("spacy")
    if not asp.available():
        pytest.skip("spaCy importable but model missing")
    os.environ["IRKG_ANNOTATOR"] = "spacy"
    try:
        sents = asp.get_annotator()(
            "The controller shall maintain a record of Article 30.",
            [{"start": 42, "text": "Article 30",
              "targets": [{"node_id": "n30", "url": "u", "seq": 30}]}])
        doc = [t for s in sents for t in s]
        refs = [t for t in doc if t.is_ref]
        assert len(refs) == 1 and refs[0].ref_targets[0]["node_id"] == "n30"
        phrases = PhraseExtractor(id_prefix="t:").extract_from_sentence(
            sents[0])
        assert any(p.token.lemma == "maintain"
                   for ph in phrases for p in ph.predicate)
    finally:
        del os.environ["IRKG_ANNOTATOR"]
