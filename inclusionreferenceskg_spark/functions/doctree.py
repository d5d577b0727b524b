"""Document-tree parsing: raw page text -> flat node rows.

Re-implements the reference's stack-machine structural parser
(``document_tree_parser.py:44-81``) and the per-type block-accept /
finalize rules (``document_parsing/node/*.py``) as pure Python over plain
dicts, then flattens the tree to pre-order rows carrying a materialized
root-to-node ``path`` — the Spark-side replacement for parent pointers and
list order.  One call parses one page; Spark parallelism is across pages
via ``mapInPandas``.

Node hierarchy and start-token regexes (depth ranks are load-bearing for
both parsing and qualifier matching):

  Document 0 (never matches), Title 1, Chapter 2, Section 3, Article 4,
  Paragraph 5 (non-consuming: the matched block falls through to
  Subparagraph), Subparagraph 6 (accepts any block whose current parent is
  at Paragraph depth or deeper), Point 7, Indent 8.

Determinism: the reference assigns ``uuid4`` node ids (``node.py:29``);
we derive ``node_id = sha256(url, seq, node_type)[:16]`` so re-runs and
checkpoint resume produce identical ids.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Iterable, List, Optional, Tuple

from inclusionreferenceskg_spark.functions.blocks import DEFAULT_CHAIN, preprocess
from inclusionreferenceskg_spark.functions.numbering import alph_to_dec, rom_to_dec

# depth rank per node type (node/*.py: each type's `depth` class attribute)
DEPTH = {
    "Root": -1,
    "Document": 0,
    "Title": 1,
    "Chapter": 2,
    "Section": 3,
    "Article": 4,
    "Paragraph": 5,
    "Subparagraph": 6,
    "Point": 7,
    "Indent": 8,
}

#: structural levels skipped when building full reference qualifiers
#: ("Article 98" never names its Chapter) — node.py:22, title/chapter/section.py
IGNORE_IN_QUALIFIER = {"Title", "Chapter", "Section"}

#: order in which block patterns are tried (document_tree_parser.py:36-38)
PATTERN_ORDER = (
    "Chapter",
    "Title",
    "Article",
    "Paragraph",
    "Section",
    "Point",
    "Indent",
    "Subparagraph",
)

#: Paragraph re-offers its matched block to later patterns (paragraph.py:11)
CONSUMES = {t: t != "Paragraph" for t in PATTERN_ORDER}

_RE_TITLE = re.compile(r"^Title ([IVXLCDM]+)\s*$", re.I)
_RE_CHAPTER = re.compile(r"^Chapter\s((?-i:[IXV]+)|(?:[1-9][0-9]*))\s*$", re.I)
_RE_SECTION = re.compile(r"Section\s*([1-9][0-9]*)", re.I)
_RE_ARTICLE = re.compile(r"^Article ([1-9][0-9]*)\s*", re.I)
_RE_PARAGRAPH = re.compile(r"^(?:([1-9][0-9]*)\.|\(([1-9][0-9]*)\))\s?.*?$", re.I)
_RE_POINT = re.compile(r"^\(([a-z]|ii)\).*?$", re.I)
_RE_INDENT = re.compile(r"^- .*?$", re.I)


def _new(node_type: str, number: Optional[int] = None, content: str = "",
         title: Optional[str] = None) -> Dict:
    return {
        "node_type": node_type,
        "depth": DEPTH[node_type],
        "number": number,
        "content": content,
        "title": title,
        "children": [],
    }


def _accept(node_type: str, block: str, parent: Dict) -> Optional[Dict]:
    """Per-type start-token matching + number normalization (node/*.py)."""
    if node_type == "Chapter":
        m = _RE_CHAPTER.match(block)
        if not m:
            return None
        g = m.group(1)
        try:
            number = int(g)
        except ValueError:
            number = rom_to_dec(g)
        return _new("Chapter", number)
    if node_type == "Title":
        m = _RE_TITLE.match(block)
        return _new("Title", rom_to_dec(m.group(1))) if m else None
    if node_type == "Article":
        m = _RE_ARTICLE.match(block)
        return _new("Article", int(m.group(1))) if m else None
    if node_type == "Paragraph":
        m = _RE_PARAGRAPH.match(block)
        if not m:
            return None
        # matched block is NOT stored: it falls through to a Subparagraph
        return _new("Paragraph", int(m.group(1) or m.group(2)))
    if node_type == "Section":
        m = _RE_SECTION.match(block)
        return _new("Section", int(m.group(1))) if m else None
    if node_type == "Point":
        m = _RE_POINT.match(block)
        return _new("Point", alph_to_dec(m.group(1)), content=block) if m else None
    if node_type == "Indent":
        m = _RE_INDENT.match(block)
        return _new("Indent", content=block) if m else None
    if node_type == "Subparagraph":
        # subparagraph.py:12-16 — accepts anything once inside a Paragraph
        if parent["depth"] >= DEPTH["Paragraph"]:
            return _new("Subparagraph", len(parent["children"]) + 1, content=block)
        return None
    raise ValueError(node_type)


def _finalize(node: Dict) -> None:
    """Pop-time content/title fixups (node/*.py finalize methods)."""
    t = node["node_type"]
    if t in ("Title", "Chapter", "Article"):
        # first content line becomes the title, the rest stays content
        lines = [l.strip() for l in node["content"].split("\n") if l.strip()]
        if lines:
            node["title"] = lines[0]
            node["content"] = "\n".join(lines[1:])
    elif t == "Section":
        node["title"] = node["content"].strip()
        node["content"] = ""
    # Subparagraph/Indent sibling renumbering is applied once at the end of
    # the parse (equivalent to the reference's pop-time renumber because
    # children lists are append-only).


def parse_tree(title: str, text: str,
               preprocessor_chain: Iterable[str] = DEFAULT_CHAIN) -> Dict:
    """Parse one page's text into a Document tree (dict nodes)."""
    document = _new("Document", title=None)
    document["title"] = title
    stack: List[Dict] = [document]

    for block in preprocess(text, preprocessor_chain):
        for pattern in PATTERN_ORDER:
            node = _accept(pattern, block, stack[-1])
            if node is not None:
                while stack[-1]["depth"] >= DEPTH[pattern]:
                    _finalize(stack.pop())
                node["parent"] = stack[-1]
                stack[-1]["children"].append(node)
                stack.append(node)
                if CONSUMES[pattern]:
                    break
        else:
            stack[-1]["content"] += "\n\n" + block

    for node in stack:
        _finalize(node)

    # positional numbering for Subparagraph/Indent (subparagraph.py:18-24,
    # indent.py:23-29): 1-based index among ALL siblings.
    todo = [document]
    while todo:
        cur = todo.pop()
        for i, child in enumerate(cur["children"], 1):
            if child["node_type"] in ("Subparagraph", "Indent"):
                child["number"] = i
            todo.append(child)

    return document


def node_id_for(url: str, seq: int, node_type: str) -> str:
    h = hashlib.sha256(f"{url}\x1f{seq}\x1f{node_type}".encode("utf-8"))
    return h.hexdigest()[:16]


def flatten_tree(document: Dict, url: str) -> List[Dict]:
    """Pre-order rows with materialized paths and deterministic ids.

    Row shape matches the `nodes` table: url, node_id, node_type, depth,
    number, title, content, parent_id, path (list of (node_type, number,
    title) from the Document down to and including the node), seq.
    """
    rows: List[Dict] = []
    # iterative pre-order; stack entries: (node, parent_id, path_prefix)
    seq = 0
    stack: List[Tuple[Dict, Optional[str], tuple]] = [(document, None, ())]
    while stack:
        node, parent_id, prefix = stack.pop()
        path = prefix + (
            {"node_type": node["node_type"], "number": node["number"],
             "title": node["title"]},
        )
        nid = node_id_for(url, seq, node["node_type"])
        rows.append({
            "url": url,
            "node_id": nid,
            "node_type": node["node_type"],
            "depth": node["depth"],
            "number": node["number"],
            "title": node["title"],
            "content": node["content"],
            "parent_id": parent_id,
            "path": list(path),
            "para_key": paragraph_key_for(url, path),
            "seq": seq,
        })
        seq += 1
        for child in reversed(node["children"]):
            stack.append((child, nid, path))
    # fix pre-order: the stack above assigns seq in pre-order only if we pop
    # parents before children, which we do; reversed() keeps sibling order.
    return rows


def paragraph_key_for(url: str, path) -> Optional[str]:
    """Serialized identity of the enclosing Paragraph (the L2 entity-linker
    blocking key, same_lemma_in_same_paragraph_linker.py:27-40); None above
    Paragraph depth.  Materialized at parse time so downstream stages never
    ship the full path array."""
    if not path or DEPTH[path[-1]["node_type"]] < DEPTH["Paragraph"]:
        return None
    prefix = []
    for el in path:
        prefix.append(f"{el['node_type']}:{el['number']}")
        if DEPTH[el["node_type"]] >= DEPTH["Paragraph"]:
            break
    return url + "|" + "/".join(prefix)


def parse_page(url: str, title: str, text: str,
               preprocessor_chain: Iterable[str] = DEFAULT_CHAIN) -> List[Dict]:
    """One page -> flat pre-order node rows (the parse UDF's core)."""
    return flatten_tree(parse_tree(title, text, preprocessor_chain), url)


def extracted_text(rows: List[Dict]) -> str:
    """Pre-order ``content + "\\n"`` concatenation (kg_renderer.py:151-159).

    This is the byte-identity artifact per url; rows must be in seq order.
    """
    return "".join((r["content"] or "") + "\n" for r in rows)
