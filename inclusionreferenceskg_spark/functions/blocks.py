"""Text-block preprocessing (the projection/filter stage of the parse UDF).

Replicates the block semantics of the reference parser byte-for-byte, because
the downstream "extracted text per url" artifact is gated on byte identity:

* blockize  — ``document_tree_parser.py:93-101``: split on ``\\n\\n``, keep
  blocks whose raw ``strip()`` is non-empty, then ``strip`` + join inner
  newlines to spaces + delete soft hyphens (U+00AD).
* header    — ``preprocessing/header_preprocessor.py:8-16``: drop blocks
  starting with a ``dd.mm.yyyy`` date (Official Journal page headers).
* initial_space — ``preprocessing/initial_space_preprocessor.py:8-25``:
  insert a space between a paragraph numbering glued to its text
  (``1.Text`` -> ``1. Text``).
* footnote_append / footnote_delete —
  ``preprocessing/footnote_append_preprocessor.py:8-38`` /
  ``footnote_delete_preprocessor.py:8-38``: a block starting with ``(n)`` is
  treated as a footnote; a backward scan looks for the most recent earlier
  block containing `` (n)`` not preceded by ``and`` or ``..,`` (fixed-width
  lookbehind) and appends (or deletes) the footnote there.  Order-dependent
  and stateful, hence per-document Python, never a row-wise expression.

These run inside the per-page parse UDF: parallelism is across pages, the
sequential scan is bounded by one page's block count.
"""

from __future__ import annotations

import re
from typing import Iterable, List

_DATE_HEADER = re.compile(r"[0-9]{1,2}\.[0-9]{1,2}\.[1-9][0-9]{3}")
_GLUED_NUMBERING = re.compile(r"^(?:(?:[1-9][0-9]*)\.|\((?:[1-9][0-9]*)\))\S")
_FOOTNOTE_START = re.compile(r"\(([1-9][0-9]*)\)")


def blockize(text: str) -> List[str]:
    """Split raw page text into cleaned blocks (byte-identical invariant)."""
    return [
        block.strip().replace("\n", " ").replace("­", "")
        for block in text.split("\n\n")
        if block.strip()
    ]


def drop_header_blocks(blocks: Iterable[str]) -> List[str]:
    return [b for b in blocks if not _DATE_HEADER.match(b)]


def fix_glued_numbering(blocks: Iterable[str]) -> List[str]:
    out = []
    for block in blocks:
        m = _GLUED_NUMBERING.match(block)
        if m:
            block = block[: m.end() - 1] + " " + block[m.end() - 1 :]
        out.append(block)
    return out


def _scan_footnotes(blocks: Iterable[str], append: bool) -> List[str]:
    # `visited` holds already-seen blocks most-recent-first so the backward
    # scan finds the nearest earlier block carrying the footnote marker.
    visited: List[str] = []
    for block in blocks:
        m = _FOOTNOTE_START.match(block)
        if m:
            marker = re.compile(r"(?<!and|..,) \(" + m.group(1) + r"\)")
            for i, earlier in enumerate(visited):
                if marker.search(earlier):
                    if append:
                        visited[i] += " " + block
                    # footnote_delete: drop the block entirely on a hit
                    break
            else:
                visited.insert(0, block)
        else:
            visited.insert(0, block)
    return list(reversed(visited))


def append_footnotes(blocks: Iterable[str]) -> List[str]:
    return _scan_footnotes(blocks, append=True)


def delete_footnotes(blocks: Iterable[str]) -> List[str]:
    return _scan_footnotes(blocks, append=False)


#: Preprocessor chains by name. The default chain order matters
#: (``document_tree_parser.py:40-42``); the detector-evaluation path uses
#: header+footnote_delete (``evaluate_reference_detector.py:81``).
PREPROCESSORS = {
    "header": drop_header_blocks,
    "initial_space": fix_glued_numbering,
    "footnote_append": append_footnotes,
    "footnote_delete": delete_footnotes,
}

DEFAULT_CHAIN = ("header", "initial_space", "footnote_append")
DETECTOR_EVAL_CHAIN = ("header", "footnote_delete")


def preprocess(text: str, chain: Iterable[str] = DEFAULT_CHAIN) -> List[str]:
    """blockize + run the named preprocessor chain in order."""
    blocks = blockize(text)
    for name in chain:
        blocks = PREPROCESSORS[name](blocks)
    return list(blocks)
