"""resolve_loose path-automaton tests (semantics of node/node.py:93-114,
wildcard/exact/miss cases modeled on tests/document_parsing/node/test_node.py)."""

from inclusionreferenceskg_spark.functions.pathmatch import path_matches


def el(t, n=None, title=None):
    return {"node_type": t, "number": n, "title": title}


DOC = el("Document", None, "GDPR")
ART30 = [DOC, el("Chapter", 4), el("Article", 30)]
PARA1 = ART30 + [el("Paragraph", 1)]
SUB1 = PARA1 + [el("Subparagraph", 1)]
POINT5 = SUB1 + [el("Point", 5)]


def test_exact_deep_match():
    pattern = [el("Document", title="GDPR"), el("Article", 30),
               el("Paragraph", 1), el("Point", 5)]
    assert path_matches(POINT5, pattern)
    # gaps allowed between (Chapter, Subparagraph skipped) but not after the
    # last element: the Subparagraph itself is not a Point target
    assert not path_matches(SUB1, pattern)


def test_last_element_must_be_candidate():
    pattern = [el("Article", 30)]
    assert path_matches(ART30, pattern)
    assert not path_matches(PARA1, pattern)  # descendant of the match


def test_wildcard_number():
    pattern = [el("Article", -1), el("Paragraph", 1)]
    assert path_matches(PARA1, pattern)


def test_number_mismatch():
    assert not path_matches(ART30, [el("Article", 31)])


def test_document_title_lenient():
    assert path_matches([DOC], [el("Document", title="gdpr")])
    assert path_matches([DOC], [el("Document", title="the GDPR text")])
    assert not path_matches([DOC], [el("Document", title="TEU")])


def test_root_pattern_consumed_by_virtual_root():
    pattern = [el("Root"), el("Document", title="GDPR"), el("Article", 30)]
    assert path_matches(ART30, pattern)


def test_non_document_title_exact():
    art = [DOC, el("Article", 30, "Records of processing activities")]
    assert path_matches(art, [el("Article", 30, "Records of processing activities")])
    assert not path_matches(art, [el("Article", 30, "records")])
    assert path_matches(art, [el("Article", 30)])  # None title matches
