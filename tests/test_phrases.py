"""Phrase-extraction tests.

The hand-annotated dependency parse is the data of the reference's
``tests/kg_creation/sentence_analysing/test_phrase_extractor.py`` ("Article
1(1) dictates that a company must pay a fine if it breaks a rule"):
annotations are constructed manually, no model involved — exactly the
reference's testing pattern.
"""

from inclusionreferenceskg_spark.functions.phrases import PhraseExtractor
from inclusionreferenceskg_spark.functions.tokens import sent_from_spec


def _example_sentence():
    # (text, pos, tag, dep, head_i[, extra])
    spec = [
        ("Article 1(1)", "PROPN", "REF", "nsubj", 1, {"is_ref": True}),
        ("dictates", "VERB", "VBZ", "ROOT", 1),
        ("that", "SCONJ", "IN", "mark", 6),
        ("a", "DET", "DT", "det", 4),
        ("company", "NOUN", "NN", "nsubj", 6),
        ("must", "AUX", "MD", "aux", 6),
        ("pay", "VERB", "VB", "ccomp", 1),
        ("a", "DET", "DT", "det", 8),
        ("fine", "NOUN", "NN", "dobj", 6),
        ("if", "SCONJ", "IN", "mark", 11),
        ("it", "PRON", "PRP", "nsubj", 11, {"coref": [4]}),
        ("breaks", "VERB", "VBZ", "advcl", 6),
        ("a", "DET", "DT", "det", 13),
        ("rule", "NOUN", "NN", "dobj", 11),
    ]
    return sent_from_spec(spec)


def test_extract_from_sentence_golden():
    sent = _example_sentence()
    phrases = PhraseExtractor().extract_from_sentence(sent)
    assert len(phrases) == 1
    phrase = phrases[0]

    assert [p.token.text for p in phrase.agent_objects] == ["Article 1(1)"]
    assert not phrase.agent_phrases
    assert not phrase.condition_phrases
    assert not phrase.patient_objects
    assert len(phrase.patient_phrases) == 1

    patient = phrase.patient_phrases[0]
    assert [p.token.text for p in patient.agent_objects] == ["company"]
    assert not patient.agent_phrases
    assert len(patient.condition_phrases) == 1
    assert [p.token.text for p in patient.patient_objects] == ["fine"]
    assert not patient.patient_phrases

    conditional = patient.condition_phrases[0]
    # "it" resolves to "company" through coref
    assert [p.token.text for p in conditional.agent_objects] == ["company"]
    assert [p.token.text for p in conditional.patient_objects] == ["rule"]
    assert not conditional.condition_phrases
    assert not conditional.patient_phrases


def test_passive_swaps_agent_and_patient():
    # "The cat is eaten by the dog"
    spec = [
        ("The", "DET", "DT", "det", 1),
        ("cat", "NOUN", "NN", "nsubjpass", 3),
        ("is", "AUX", "VBZ", "auxpass", 3),
        ("eaten", "VERB", "VBN", "ROOT", 3),
        ("by", "ADP", "IN", "agent", 3),
        ("the", "DET", "DT", "det", 6),
        ("dog", "NOUN", "NN", "pobj", 4),
    ]
    sent = sent_from_spec(spec)
    (phrase,) = PhraseExtractor().extract_from_sentence(sent)
    assert [p.token.text for p in phrase.agent_objects] == ["dog"]
    assert [p.token.text for p in phrase.patient_objects] == ["cat"]


def test_conjunct_verbs_form_one_group():
    # "The provider collects and stores data"
    spec = [
        ("The", "DET", "DT", "det", 1),
        ("provider", "NOUN", "NN", "nsubj", 2),
        ("collects", "VERB", "VBZ", "ROOT", 2),
        ("and", "CCONJ", "CC", "cc", 2),
        ("stores", "VERB", "VBZ", "conj", 2),
        ("data", "NOUN", "NNS", "dobj", 4),
    ]
    sent = sent_from_spec(spec)
    (phrase,) = PhraseExtractor().extract_from_sentence(sent)
    assert sorted(p.token.text for p in phrase.predicate) == \
        ["collects", "stores"]
    assert [p.token.text for p in phrase.agent_objects] == ["provider"]
    assert [p.token.text for p in phrase.patient_objects] == ["data"]


def test_phrases_without_agent_or_patient_dropped():
    spec = [("It", "PRON", "PRP", "nsubj", 1), ("rains", "VERB", "VBZ",
                                                "ROOT", 1)]
    sent = sent_from_spec(spec)
    # subject "It" with no coref -> agent exists, phrase kept
    assert len(PhraseExtractor().extract_from_sentence(sent)) == 1
    spec2 = [("rains", "VERB", "VBZ", "ROOT", 0)]
    assert PhraseExtractor().extract_from_sentence(sent_from_spec(spec2)) == []
