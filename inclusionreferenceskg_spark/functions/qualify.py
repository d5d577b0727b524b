"""Reference resolution: mention text -> qualifier patterns.

Re-implements the reference's ``ReferenceResolver``
(``reference_resolution/reference_resolver.py:33-466``) over plain dicts.
A *qualifier* is a depth-sorted list of pattern elements
``{node_type, number, title, ref_url}`` that is later matched against the
``nodes`` table's materialized paths (see ``pathmatch.py``).

Key semantics preserved exactly (P/R vs the reference depends on them):

* mention text is split on ``" of "``; extractors run per segment in a fixed
  order (Article, Paragraph, Point, Chapter-roman, Title-roman,
  Chapter-decimal, ordinal, this, that, those, document, tight paragraph
  notation, tight point notation, thereof) — ``reference_resolver.py:52-77``;
* one node per type: component lists are grouped by node type and expanded
  via cartesian product, so "Paragraphs 1 and 2 of Article 3" yields two
  patterns — ``:86-90``;
* full qualification: each pattern is extended with the citing node's
  ancestor elements above the highest specified depth, skipping
  Title/Chapter/Section (``ignore_when_forming_full_qualifier``), including
  the virtual Root — ``:93-107``;
* ``that``/``those``/``thereof`` consume the *previous mentions of the same
  node*, which is why qualifier building is sequential per node (and
  embarrassingly parallel across nodes).

Scale addition: elements derived from the citing node's own path carry
``ref_url`` so target resolution becomes an equi-join on url instead of a
lenient title match (title matching is only needed for genuinely
cross-document citations, which join a tiny per-corpus title dimension).
"""

from __future__ import annotations

import itertools
import re
from collections import defaultdict
from typing import Dict, List, Optional

from inclusionreferenceskg_spark.functions import grammar
from inclusionreferenceskg_spark.functions.doctree import (
    DEPTH,
    IGNORE_IN_QUALIFIER,
)
from inclusionreferenceskg_spark.functions.numbering import alph_to_dec, rom_to_dec

#: iteration order standing in for the reference's ``Node.__subclasses__()``
#: (names are unambiguous prefixes, so only determinism matters here)
NODE_TYPE_ORDER = (
    "Document", "Title", "Chapter", "Section", "Article",
    "Paragraph", "Subparagraph", "Point", "Indent", "Root",
)

_ORDINALS = {"first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5, "sixth": 6}

_NUMBER_FORMATS = {
    "number": grammar.NUMBER,
    "alpha": grammar.ALPHA,
    "paragraph": grammar.PARAGRAPH,
    "roman": grammar.ROMAN,
}


def _el(node_type: str, number: Optional[int] = None, title: Optional[str] = None,
        ref_url: Optional[str] = None) -> Dict:
    return {"node_type": node_type, "number": number, "title": title,
            "ref_url": ref_url}


def _translate(number_format: str, raw: str) -> int:
    if number_format == "number":
        return int(raw)
    if number_format == "alpha":
        return alph_to_dec(raw[1:-1])
    if number_format == "paragraph":
        return int(raw[1:-1])
    if number_format == "roman":
        return rom_to_dec(raw)
    raise ValueError(number_format)


def _extract_from_pattern(text: str, main_pattern: str, number_format: str,
                          node_type: str) -> List[Dict]:
    """Range/list expansion shared by all numeric extractors
    (reference_resolver.py:199-228)."""
    fmt = _NUMBER_FORMATS[number_format]
    main_match = re.match(main_pattern, text, re.I)
    if not main_match:
        return []
    out = []
    rng = fr"({fmt})(?:\sto\s({fmt}))?"
    for first, end in re.findall(rng, main_match.group(0), re.I):
        if end:
            for n in range(_translate(number_format, first),
                           _translate(number_format, end) + 1):
                out.append(_el(node_type, number=n))
        else:
            out.append(_el(node_type, number=_translate(number_format, first)))
    return out


def _basic(text: str, node_type: str, number_format: str) -> List[Dict]:
    """``Article(s) 1, 2 to 4 and 6``-style (reference_resolver.py:172-196)."""
    fmt = _NUMBER_FORMATS[number_format]
    rng = fr"({fmt}(?:\sto\s{fmt})?)"
    main = (fr"{node_type}s?\s{rng}(?:,\s{rng})*"
            fr"(?:\s(?:{grammar.CONJUNCTION})\s{rng})*")
    return _extract_from_pattern(text, main, number_format, node_type)


def _tight(text: str, number_format: str, node_type: str) -> List[Dict]:
    """Parenthesized tight notation ``Article 6(1)`` / ``paragraph 2(b), (d)
    to (f)`` (reference_resolver.py:113-138)."""
    fmt = _NUMBER_FORMATS[number_format]
    rng = fr"({fmt}(?:\sto\s{fmt})?)"
    main = (fr".*{grammar.NUMBER}{rng}(?:,\s{rng})*"
            fr"(?:\s(?:{grammar.CONJUNCTION})\s{rng})*")
    return _extract_from_pattern(text, main, number_format, node_type)


def _resolve_document(text: str) -> List[Dict]:
    """Document-title patterns (reference_resolver.py:230-254)."""
    multiple_directives = (fr"(?:(?:{grammar.ORDINAL}\s)?Council\s)?"
                           fr"Directive(s{grammar.DOC_NUMBERING_PLURAL})")
    m = re.match(multiple_directives, text, re.I)
    if m:
        return [
            _el("Document", title=f"Directive{numbering}")
            for numbering in re.findall(grammar.DOC_NUMBERING, m.group(0), re.I)
        ]

    regulation = fr"(?:Commission\s)?Regulation{grammar.DOC_NUMBERING}"
    directive = (fr"(?:(?:{grammar.ORDINAL}\s)?Council\s)?"
                 fr"Directive{grammar.DOC_NUMBERING}")
    treaty = (r"(?:the\streaty\s(?:(?:[a-z]*){0,2}\s[A-Z][a-z]*)+)"
              r"(?-i:\s\([A-Z]{2,}\))?|(?:the\s)?(?-i:[A-Z]{2,})")
    if re.match(fr"{regulation}|{directive}|{treaty}", text, re.I):
        return [_el("Document", title=text)]
    return []


def _resolve_this(text: str, node_path: List[Dict], url: str) -> List[Dict]:
    """``this Article/Regulation/...`` -> citing node's ancestor path from
    the deepest element of that type upward, Root included
    (reference_resolver.py:256-287; no ignore-filtering here)."""

    def path_from(node_type: str) -> List[Dict]:
        # deepest occurrence of node_type in the citing path, then upward
        idx = None
        for i, el in enumerate(node_path):
            if el["node_type"] == node_type:
                idx = i
        if idx is None:
            return []
        out = [
            _el(el["node_type"], number=el["number"], title=el["title"],
                ref_url=url)
            for el in reversed(node_path[: idx + 1])
        ]
        out.append(_el("Root"))
        return out

    for nt in NODE_TYPE_ORDER:
        if re.match(fr"this\s{nt}", text, re.I):
            ret = path_from(nt)
            if ret:
                return ret
    for name in ("regulation", "directive", "treaty"):
        if re.match(fr"this\s{name}", text, re.I):
            ret = path_from("Document")
            if ret:
                return ret
    return []


def _resolve_that(text: str, previous: List[List[List[Dict]]]) -> List[Dict]:
    """``that Directive`` -> suffix of the immediately preceding mention's
    pattern from the first element of the named type
    (reference_resolver.py:289-319)."""

    def from_previous(node_type: str) -> List[Dict]:
        if not previous:
            return []
        for prev_ref in reversed(previous[-1]):
            by_depth = sorted(prev_ref, key=lambda e: DEPTH[e["node_type"]],
                              reverse=True)
            for i, el in enumerate(by_depth):
                if el["node_type"] == node_type:
                    return [dict(e) for e in by_depth[i:]]
        return []

    for nt in NODE_TYPE_ORDER:
        if re.match(fr"that\s{nt}", text, re.I):
            ret = from_previous(nt)
            if ret:
                return ret
    for name in ("regulation", "directive", "treaty"):
        if re.match(fr"that\s{name}", text, re.I):
            ret = from_previous("Document")
            if ret:
                return ret
    return []


def _resolve_those(text: str, previous: List[List[List[Dict]]]) -> List[Dict]:
    """``those paragraphs`` -> all nodes of the type from the latest
    preceding mention group (reference_resolver.py:321-360; shares the
    reference's single-root-path assumption)."""

    def from_previous(node_type: str) -> List[Dict]:
        ret: List[Dict] = []
        for ref_group in reversed(previous):
            for prev_ref in ref_group:
                by_depth = sorted(prev_ref, key=lambda e: DEPTH[e["node_type"]],
                                  reverse=True)
                for i, el in enumerate(by_depth):
                    if el["node_type"] == node_type:
                        if ret:
                            ret.append(dict(el))
                        else:
                            ret.extend(dict(e) for e in by_depth[i:])
            if ret:
                return ret
        return ret

    for nt in NODE_TYPE_ORDER:
        if re.match(fr"those\s{nt}s", text, re.I):
            ret = from_previous(nt)
            if ret:
                return ret
    return []


def _resolve_ordinal(text: str) -> List[Dict]:
    """``the first subparagraph`` -> Subparagraph(1)
    (reference_resolver.py:362-384)."""
    names = "|".join(_ORDINALS)
    for nt in NODE_TYPE_ORDER:
        m = re.match(fr"the\s({names})\s{nt}", text, re.I)
        if m:
            return [_el(nt, number=_ORDINALS[m.group(1).lower()])]
    return []


def _resolve_thereof(text: str, previous: List[List[List[Dict]]],
                     current: List[Dict]) -> List[Dict]:
    """Trailing ``thereof`` borrows the shallower part of the previous
    mention's last pattern (reference_resolver.py:386-418)."""
    flat = [p for group in previous for p in group]
    if not text.lower().endswith("thereof") or not flat or not current:
        return []
    last = flat[-1]
    min_depth = min(DEPTH[e["node_type"]] for e in current)
    return [dict(e) for e in last if DEPTH[e["node_type"]] < min_depth]


def resolve_mentions(mentions: List[str], node_path: List[Dict],
                     url: str) -> List[List[List[Dict]]]:
    """Build qualifier patterns for a node's mentions, in reading order.

    :param mentions: mention texts in document order within this node.
    :param node_path: the citing node's root-to-self path (Document first),
        elements ``{node_type, number, title}``.
    :param url: the citing page url (stamped on same-document elements).
    :return: per mention, a list of qualifier patterns, each a depth-sorted
        list of pattern elements.  Mirrors
        ``ReferenceResolver.resolve_single`` (reference_resolver.py:33-111).
    """
    all_patterns: List[List[List[Dict]]] = []
    for mention_text in mentions:
        components: List[Dict] = []
        for segment in mention_text.split(" of "):
            seg_components: List[Dict] = []
            seg_components.extend(_basic(segment, "Article", "number"))
            seg_components.extend(_basic(segment, "Paragraph", "number"))
            seg_components.extend(_basic(segment, "Point", "alpha"))
            seg_components.extend(_basic(segment, "Chapter", "roman"))
            seg_components.extend(_basic(segment, "Title", "roman"))
            seg_components.extend(_basic(segment, "Chapter", "number"))
            seg_components.extend(_resolve_ordinal(segment))
            seg_components.extend(_resolve_this(segment, node_path, url))
            seg_components.extend(_resolve_that(segment, all_patterns))
            seg_components.extend(_resolve_those(segment, all_patterns))
            seg_components.extend(_resolve_document(segment))
            seg_components.extend(_tight(segment, "paragraph", "Paragraph"))
            seg_components.extend(_tight(segment, "alpha", "Point"))
            seg_components.extend(
                _resolve_thereof(segment, all_patterns, seg_components))
            components.extend(seg_components)

        # one node per type: group by type (insertion order), expand product
        grouped: "defaultdict[str, List[Dict]]" = defaultdict(list)
        for el in components:
            grouped[el["node_type"]].append(el)
        patterns = [list(combo) for combo in itertools.product(*grouped.values())
                    if combo]

        # fully qualify with the citing node's ancestors above the highest
        # specified depth, skipping Title/Chapter/Section, Root included
        for pattern in patterns:
            highest = min(DEPTH[e["node_type"]] for e in pattern)
            specifier = [
                _el(el["node_type"], number=el["number"], title=el["title"],
                    ref_url=url)
                for el in node_path
                if DEPTH[el["node_type"]] < highest
                and el["node_type"] not in IGNORE_IN_QUALIFIER
            ]
            if DEPTH["Root"] < highest:
                specifier.append(_el("Root"))
            pattern.extend(specifier)
            pattern.sort(key=lambda e: DEPTH[e["node_type"]])

        all_patterns.append(patterns)
    return all_patterns
