"""spaCy-backed annotator adapter (the real-model swap path).

The reference pipeline annotates with spaCy ``en_core_web_sm``/``trf`` plus
coreferee (reference ``kg_creation/kg_renderer.py:201-232``); this sandbox
cannot install either, so production runs use the deterministic rule
annotator in ``annotate.py``.  This module is the OTHER half of that
contract: when spaCy *is* importable (a real deployment image), it serves
the identical ``annotate_text(content, mentions) -> List[Sent]`` surface
from a genuine statistical model, so the swap is one env var
(``IRKG_ANNOTATOR=spacy``) rather than a code change.

Design notes

- Mention merging mirrors the reference's retokenizer
  (``reference_detection/reference_detector.py:22-45``): each detected
  mention span is merged into ONE token tagged ``REF``/``PROPN`` carrying
  its resolved targets, BEFORE the text reaches the phrase extractor.
  We merge via ``doc.char_span(..., alignment_mode="expand")`` exactly like
  the reference handles mid-token boundaries.
- The Doc -> ``tokens.Tok`` mapping is pure and spaCy-agnostic
  (``doc_to_sents``): it only reads the duck-typed surface
  ``sents / i / text / lemma_ / pos_ / tag_ / dep_ / head.i / idx``, which
  lets CI exercise the mapping with a stub doc even though the model
  itself cannot load here.
- Coref: if a ``coreferee`` pipe is present its chains are translated to
  the same ``Tok.coref`` antecedent-index lists the rule annotator emits
  (reference consumes chains in ``kg_renderer.py:225-232``).

Everything is executor-local: the nlp object is a module-level lazy
singleton (one model load per executor process, never pickled through a
closure), matching how the Arrow-batched ``mapInPandas`` stages in
``operators/parse.py`` expect annotator state to live.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

from inclusionreferenceskg_spark.functions.tokens import (
    Sent,
    Tok,
    index_children,
    make_doc,
)

#: spaCy model name; override with IRKG_SPACY_MODEL (the reference defaults
#: to en_core_web_sm and upgrades to _trf, kg_renderer.py:205-208).
DEFAULT_MODEL = "en_core_web_sm"

_NLP = None          # lazy singleton (per executor process)
_NLP_ERR: Optional[str] = None


def available() -> bool:
    """True iff spaCy and the configured model can actually load."""
    return _load_nlp() is not None


def _load_nlp():
    global _NLP, _NLP_ERR
    if _NLP is not None or _NLP_ERR is not None:
        return _NLP
    try:
        import spacy  # noqa: F401  (import-gated: absent in this sandbox)
    except Exception as exc:  # pragma: no cover - spaCy not in sandbox
        _NLP_ERR = f"spacy import failed: {exc}"
        return None
    try:  # pragma: no cover - model not in sandbox
        model = os.environ.get("IRKG_SPACY_MODEL", DEFAULT_MODEL)
        nlp = spacy.load(model)
        try:
            import coreferee  # noqa: F401
            if "coreferee" not in nlp.pipe_names:
                nlp.add_pipe("coreferee")
        except Exception:
            pass  # coref is optional; Tok.coref stays None
        from spacy.tokens import Token
        for ext in ("ref_targets", "is_ref"):
            if not Token.has_extension(ext):
                Token.set_extension(ext, default=None)
        _NLP = nlp
    except Exception as exc:  # pragma: no cover
        _NLP_ERR = f"spacy model load failed: {exc}"
        return None
    return _NLP


def merge_mentions(doc, mentions: Sequence[Dict]):  # pragma: no cover - needs spaCy
    """Retokenize mention spans into single REF tokens (reference
    ``reference_detector.py:22-45``)."""
    spans = []
    for mention in sorted(mentions or [], key=lambda m: m["start"]):
        start = mention["start"]
        span = doc.char_span(start, start + len(mention["text"]),
                             alignment_mode="expand")
        if span is not None:
            spans.append((span, mention))
    with doc.retokenize() as retok:
        seen_end = -1
        for span, mention in spans:
            if span.start < seen_end:
                continue  # overlapping spans cannot both merge
            retok.merge(span, attrs={"POS": "PROPN", "TAG": "REF"})
            seen_end = span.end
    # after retokenize the merged tokens are single tokens at the span
    # starts; re-locate them by char offset to attach targets
    by_idx = {t.idx: t for t in doc}
    for _, mention in spans:
        tok = by_idx.get(mention["start"])
        if tok is not None:
            tok._.is_ref = True
            tok._.ref_targets = list(mention.get("targets") or [])
    return doc


def doc_to_sents(doc) -> List[Sent]:
    """Map a spaCy(-shaped) Doc onto the engine's token model.

    Pure function over the duck-typed read surface; head indices stay
    doc-global (both models use head==self for roots, so the mapping is
    1:1).  Exercised in CI with a stub doc (``tests/test_annotate_spacy.py``)
    and by the real model wherever spaCy is installed.
    """
    sent_toks: List[List[Tok]] = []
    for sent in doc.sents:
        toks = []
        for t in sent:
            is_ref = bool(_ext(t, "is_ref"))
            toks.append(Tok(
                t.i, t.text,
                lemma=(t.lemma_ or t.text.lower()),
                pos=("PROPN" if is_ref else t.pos_),
                tag=("REF" if is_ref else t.tag_),
                dep=t.dep_,
                head_i=t.head.i,
                is_ref=is_ref,
                ref_targets=list(_ext(t, "ref_targets") or []),
                idx=t.idx,
            ))
        sent_toks.append(toks)
    sents = make_doc(sent_toks)
    flat = [t for s in sents for t in s]
    index_children(flat)
    _map_coref(doc, flat)
    return sents


def _ext(tok, name):
    """Read a spaCy Token extension if present (stub docs may expose the
    attribute directly)."""
    under = getattr(tok, "_", None)
    if under is not None and hasattr(under, name):
        return getattr(under, name)
    return getattr(tok, name, None)


def _map_coref(doc, flat: List[Tok]) -> None:
    """coreferee chains -> Tok.coref antecedent index lists (reference
    ``kg_renderer.py:225-232`` resolves via doc._.coref_chains.resolve)."""
    chains = _ext(doc, "coref_chains")
    if not chains:
        return
    try:
        for tok in flat:
            resolved = chains.resolve(doc[tok.i])
            if resolved:
                tok.coref = [r.i for r in resolved]
    except Exception:  # pragma: no cover - defensive: chain API drift
        pass


def annotate_text_spacy(content: str, mentions: Sequence[Dict]) -> List[Sent]:
    """Drop-in replacement for ``annotate.annotate_text`` backed by a real
    model.  Raises RuntimeError when spaCy is unavailable — callers select
    the implementation through ``get_annotator()``."""
    nlp = _load_nlp()
    if nlp is None:  # pragma: no cover - sandbox path is the rule annotator
        raise RuntimeError(f"spaCy annotator unavailable: {_NLP_ERR}")
    doc = nlp(content or "")
    merge_mentions(doc, mentions or [])
    return doc_to_sents(doc)


def get_annotator():
    """Resolve the annotator implementation for this process.

    ``IRKG_ANNOTATOR=spacy`` selects the real model (hard error if it cannot
    load — silent fallback would corrupt the P/R gate unnoticed);
    ``auto`` prefers spaCy when importable; default/``rule`` is the
    deterministic annotator.  Ship the env var to executors via
    ``spark.executorEnv.IRKG_ANNOTATOR`` on a real cluster.
    """
    choice = os.environ.get("IRKG_ANNOTATOR", "rule").strip().lower()
    if choice == "spacy":
        if _load_nlp() is None:
            raise RuntimeError(
                f"IRKG_ANNOTATOR=spacy but spaCy is unusable: {_NLP_ERR}")
        return annotate_text_spacy
    if choice == "auto" and available():  # pragma: no cover - needs spaCy
        return annotate_text_spacy
    from inclusionreferenceskg_spark.functions.annotate import annotate_text
    return annotate_text
