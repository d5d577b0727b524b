"""Qualifier-resolution tests.

The mention texts and expected qualifier skeletons are the data of the
reference's ``tests/reference_resolution/test_reference_resolver.py``.  One
adaptation: in the Spark model every citing node lives under a Document and
the virtual corpus Root, so fully-qualified patterns additionally begin with
``Root`` (and, when the citing path includes one, ``Document``) — in the
reference these only appear when the citing node is attached to a parsed
corpus, which is always the case in production (``parser_util.py:8-48``).
"""

from inclusionreferenceskg_spark.functions.qualify import resolve_mentions


def _bare(pattern):
    return [(e["node_type"], e["number"], e["title"]) for e in pattern]


ARTICLE1_PATH = [
    {"node_type": "Document", "number": None, "title": "Doc A"},
    {"node_type": "Article", "number": 1, "title": None},
]
ARTICLE2_PATH = [
    {"node_type": "Document", "number": None, "title": "Doc A"},
    {"node_type": "Article", "number": 2, "title": None},
]
CHAPTER1_PATH = [
    {"node_type": "Document", "number": None, "title": "Doc A"},
    {"node_type": "Chapter", "number": 1, "title": None},
]

PREFIX = [("Root", None, None), ("Document", None, "Doc A")]


def test_point_after_paragraph_tight_notation():
    [(patterns,)] = [resolve_mentions(["paragraph 2(b), (d) to (f), (h)"],
                                      ARTICLE1_PATH, "u://a")]
    expected_points = [2, 4, 5, 6, 8]
    assert [_bare(p) for p in patterns] == [
        PREFIX + [("Article", 1, None), ("Paragraph", 2, None),
                  ("Point", pt, None)]
        for pt in expected_points
    ]


def test_point_without_paragraph():
    [patterns] = resolve_mentions(["Article 1(d)"], CHAPTER1_PATH, "u://a")
    # Chapter is ignored when forming the full qualifier
    assert [_bare(p) for p in patterns] == [
        PREFIX + [("Article", 1, None), ("Point", 4, None)]
    ]


def test_paragraph_after_article():
    [patterns] = resolve_mentions(["Article 1(2), (4) to (6), (8)"],
                                  ARTICLE2_PATH, "u://a")
    assert [_bare(p) for p in patterns] == [
        PREFIX + [("Article", 1, None), ("Paragraph", n, None)]
        for n in (2, 4, 5, 6, 8)
    ]


def test_multiple_directives_in_conjunction():
    [patterns] = resolve_mentions(["Directives 95/46/EC and 97/66/EC"],
                                  ARTICLE1_PATH, "u://a")
    assert [_bare(p) for p in patterns] == [
        [("Root", None, None), ("Document", None, "Directive 95/46/EC")],
        [("Root", None, None), ("Document", None, "Directive 97/66/EC")],
    ]


def test_multiple_treaties():
    [patterns] = resolve_mentions(
        ["Titles V and VI of the Treaty on European Union"],
        ARTICLE1_PATH, "u://a")
    assert [_bare(p) for p in patterns] == [
        [("Root", None, None),
         ("Document", None, "the Treaty on European Union"), ("Title", 5, None)],
        [("Root", None, None),
         ("Document", None, "the Treaty on European Union"), ("Title", 6, None)],
    ]


def test_this_article_uses_citing_path():
    [patterns] = resolve_mentions(["paragraph 1 of this Article"],
                                  ARTICLE2_PATH, "u://a")
    assert [_bare(p) for p in patterns] == [
        [("Root", None, None), ("Document", None, "Doc A"),
         ("Article", 2, None), ("Paragraph", 1, None)],
    ]


def test_that_directive_borrows_previous_mention():
    results = resolve_mentions(
        ["Directive 2000/31/EC", "Articles 12 to 15 of that Directive"],
        ARTICLE1_PATH, "u://a")
    assert [_bare(p) for p in results[0]] == [
        [("Root", None, None), ("Document", None, "Directive 2000/31/EC")]]
    assert [_bare(p) for p in results[1]] == [
        [("Root", None, None), ("Document", None, "Directive 2000/31/EC"),
         ("Article", n, None)]
        for n in (12, 13, 14, 15)
    ]


def test_sequential_state_is_per_call():
    # "that Directive" with no previous mention resolves to nothing
    [patterns] = resolve_mentions(["Articles 12 to 15 of that Directive"],
                                  ARTICLE1_PATH, "u://a")
    # articles still extracted; the Directive segment contributes nothing
    assert all(("Document", None, "Directive 2000/31/EC") not in _bare(p)
               for p in patterns)
