"""Minimal token/sentence model with a spaCy-shaped read API.

The phrase-extraction rules from the reference
(``kg_creation/sentence_analysing/*``) consume only this surface:
``tok.i, text, lemma, pos, tag, dep, head, children, lefts, rights`` plus
the custom attributes the reference sets via spaCy extensions
(``tok._.reference`` -> ``ref_targets``/``is_ref`` here, coref chains ->
``coref`` antecedent lists).  Tests can hand-annotate sentences exactly like
the reference's model-free unit tests; production annotations come from
``annotate.py``.  If spaCy becomes available, its Doc maps 1:1 onto this.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence


class Tok:
    __slots__ = ("i", "text", "lemma", "pos", "tag", "dep", "head_i", "sent",
                 "is_ref", "ref_targets", "coref", "idx", "_children",
                 "_rights", "_lefts", "acl_coord")

    def __init__(self, i: int, text: str, lemma: str = None, pos: str = "X",
                 tag: str = "", dep: str = "dep", head_i: int = None,
                 is_ref: bool = False,
                 ref_targets: Optional[List[Dict]] = None,
                 coref: Optional[List[int]] = None, idx: int = 0):
        self.i = i
        self.text = text
        self.lemma = lemma if lemma is not None else text.lower()
        self.pos = pos
        self.tag = tag
        self.dep = dep
        self.head_i = head_i if head_i is not None else i
        self.sent: "Sent" = None
        self.is_ref = is_ref
        # resolved mention targets: [{'node_id':…,'url':…,'seq':…}, ...]
        self.ref_targets = ref_targets or []
        # indices of coref antecedent tokens (doc-level), or None
        self.coref = coref
        self.idx = idx           # char offset in the document text
        self._children = None    # filled by index_children for O(1) access
        self._rights = None
        self._lefts = None
        self.acl_coord = False   # acl attached to a coordination root

    @property
    def head(self) -> "Tok":
        return self.sent.doc[self.head_i]

    @property
    def children(self) -> List["Tok"]:
        if self._children is not None:
            return self._children
        return [t for t in self.sent.doc
                if t.head_i == self.i and t.i != self.i]

    @property
    def lefts(self) -> List["Tok"]:
        if self._lefts is not None:
            return self._lefts
        return [t for t in self.children if t.i < self.i]

    @property
    def rights(self) -> List["Tok"]:
        if self._rights is not None:
            return self._rights
        return [t for t in self.children if t.i > self.i]

    def __repr__(self):
        return f"Tok({self.i},{self.text!r},{self.pos},{self.dep})"


class Sent:
    """A sentence over a shared doc-level token list (head indices are
    doc-level, mirroring spaCy)."""

    def __init__(self, doc: List[Tok], start: int, end: int):
        self.doc = doc
        self.start = start
        self.end = end
        for t in doc[start:end]:
            t.sent = self

    def __iter__(self):
        return iter(self.doc[self.start:self.end])

    def __len__(self):
        return self.end - self.start


def make_doc(token_lists: Sequence[Sequence[Tok]]) -> List[Sent]:
    """Assemble sentences (with per-sentence-local head indices already
    doc-global) into a doc; returns the sentence list."""
    doc: List[Tok] = []
    sents: List[Sent] = []
    for toks in token_lists:
        start = len(doc)
        doc.extend(toks)
        sents.append(Sent(doc, start, len(doc)))
    for s in sents:
        for t in s:
            t.sent = s
    return sents


def index_children(doc: List[Tok]) -> None:
    """Precompute child/left/right lists (the properties scan the doc
    otherwise, which is O(n²) over page-sized docs; the extractor reads
    ``rights`` ~10k times per 60 docs)."""
    for t in doc:
        t._children = []
    for t in doc:
        if t.head_i != t.i:
            doc[t.head_i]._children.append(t)
    for t in doc:
        t._lefts = [c for c in t._children if c.i < t.i]
        t._rights = [c for c in t._children if c.i > t.i]


def sent_from_spec(spec: Iterable[tuple]) -> Sent:
    """Build a one-sentence doc from (text, pos, tag, dep, head_i) tuples —
    the hand-annotation helper used by tests (mirrors the reference's
    model-free Doc construction in its unit tests)."""
    toks = []
    for i, row in enumerate(spec):
        text, pos, tag, dep, head_i = row[:5]
        extra = row[5] if len(row) > 5 else {}
        toks.append(Tok(i, text, pos=pos, tag=tag, dep=dep, head_i=head_i,
                        **extra))
    (sent,) = make_doc([toks])
    return sent
