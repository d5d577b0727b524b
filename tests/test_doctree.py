"""Golden-tree parse test.

The input text and expected tree are the data of the reference's
``tests/document_parsing/test_document_tree_parser.py`` (GDPR Article 5
excerpt): it covers Chapter/Section/Article headings, Paragraph+Subparagraph
fallthrough, point numbering incl. ``(i)``->9 / ``(ii)``->10, indent sibling
numbering, the date-header filter, and title extraction.
"""

from inclusionreferenceskg_spark.functions.doctree import (
    extracted_text,
    parse_page,
    parse_tree,
)

TEXT = """
CHAPTER II

Principles

Section 1

Fake Section Title

Article 5

Principles relating to processing of personal data

1. Personal data shall be:

(a)  processed lawfully, fairly and in a transparent manner in relation to the data subject (‘lawfulness, fairness and
transparency’);

(b)  collected for specified, explicit and legitimate purposes and not further processed in a manner that is incompatible
with those purposes; further processing for archiving purposes in the public interest, scientific or historical research
purposes or statistical purposes shall, in accordance with Article 89(1), not be considered to be incompatible with
the initial purposes (‘purpose limitation’);

(c)  adequate, relevant and limited to what is necessary in relation to the purposes for which they are processed (‘data
minimisation’);

(d)  accurate and, where necessary, kept up to date; every reasonable step must be taken to ensure that personal data that
are inaccurate, having regard to the purposes for which they are processed, are erased or rectified without delay
(‘accuracy’);

4.5.2016 L 119/35 Official Journal of the European Union EN


(e)  kept in a form which permits identification of data subjects for no longer than is necessary for the purposes for
which the personal data are processed; personal data may be stored for longer periods insofar as the personal data
will be processed solely for archiving purposes in the public interest, scientific or historical research purposes or
statistical purposes in accordance with Article 89(1) subject to implementation of the appropriate technical and
organisational measures required by this Regulation in order to safeguard the rights and freedoms of the data subject
(‘storage limitation’);

(f)  processed in a manner that ensures appropriate security of the personal data, including protection against
unauthorised or unlawful processing and against accidental loss, destruction or damage, using appropriate technical
or organisational measures (‘integrity and confidentiality’).

2. The controller shall be responsible for, and be able to demonstrate compliance with, paragraph 1 (‘accountability’).

(i) The coordinated field concerns requirements with which the service provider has to comply in respect of:

- the taking up of the activity of an information society service, such as requirements concerning qualifications, authorisation or notification,

- the pursuit of the activity of an information society service, such as requirements concerning the behaviour of the service provider, requirements regarding the quality or content of the service including those applicable to advertising and contracts, or requirements concerning the liability of the service provider;

(ii) The coordinated field does not cover requirements such as:

- requirements applicable to goods as such,

- requirements applicable to services not provided by electronic means.

"""


def _skeleton(node):
    return (
        node["node_type"],
        node["number"],
        node["title"],
        [_skeleton(c) for c in node["children"]],
    )


def test_golden_tree_structure():
    tree = parse_tree("Test Regulation", TEXT)
    skel = _skeleton(tree)

    assert skel[0] == "Document"
    assert skel[2] == "Test Regulation"
    (chapter,) = skel[3]
    assert chapter[:3] == ("Chapter", 2, "Principles")
    (section,) = chapter[3]
    assert section[:3] == ("Section", 1, "Fake Section Title")
    (article,) = section[3]
    assert article[:3] == (
        "Article", 5, "Principles relating to processing of personal data")
    para1, para2 = article[3]
    assert para1[:2] == ("Paragraph", 1)
    (sub1,) = para1[3]
    assert sub1[:2] == ("Subparagraph", 1)
    assert [p[:2] for p in sub1[3]] == [("Point", i) for i in range(1, 7)]
    assert para2[:2] == ("Paragraph", 2)
    (sub2,) = para2[3]
    pt_i, pt_ii = sub2[3]
    assert pt_i[:2] == ("Point", 9)
    assert pt_ii[:2] == ("Point", 10)
    assert [x[:2] for x in pt_i[3]] == [("Indent", 1), ("Indent", 2)]
    assert [x[:2] for x in pt_ii[3]] == [("Indent", 1), ("Indent", 2)]


def test_golden_tree_contents():
    tree = parse_tree("Test Regulation", TEXT)
    article = tree["children"][0]["children"][0]["children"][0]
    sub1 = article["children"][0]["children"][0]
    assert sub1["content"] == "1. Personal data shall be:"
    point_a = sub1["children"][0]
    assert point_a["content"].startswith("(a)  processed lawfully")
    assert point_a["content"].endswith("transparency’);")
    # soft-hyphen-free, single-space joined, header block removed
    point_e = sub1["children"][4]
    assert "Official Journal" not in point_e["content"]
    assert point_e["content"].startswith("(e)  kept in a form")
    sub2 = article["children"][1]["children"][0]
    assert sub2["content"].startswith("2. The controller shall")


def test_flatten_pre_order_and_paths():
    rows = parse_page("u://x", "Test Regulation", TEXT)
    assert [r["seq"] for r in rows] == list(range(len(rows)))
    by_type = {}
    for r in rows:
        by_type.setdefault(r["node_type"], []).append(r)
    assert len(by_type["Document"]) == 1
    assert len(by_type["Paragraph"]) == 2
    assert len(by_type["Point"]) == 8
    assert len(by_type["Indent"]) == 4
    art = by_type["Article"][0]
    assert [p["node_type"] for p in art["path"]] == [
        "Document", "Chapter", "Section", "Article"]
    # parent links consistent with paths
    ids = {r["node_id"]: r for r in rows}
    for r in rows:
        if r["parent_id"] is not None:
            parent = ids[r["parent_id"]]
            assert r["path"][:-1] == parent["path"]


def test_extracted_text_is_preorder_content_concat():
    rows = parse_page("u://x", "T", "Article 1\n\nTitle line\n\nBody text")
    text = extracted_text(rows)
    # Document content "", Article content "" after title extraction...
    assert text.endswith("\n")
    assert "Body text" in text


def test_node_ids_deterministic():
    a = parse_page("u://x", "T", TEXT)
    b = parse_page("u://x", "T", TEXT)
    assert [r["node_id"] for r in a] == [r["node_id"] for r in b]
    c = parse_page("u://y", "T", TEXT)
    assert a[0]["node_id"] != c[0]["node_id"]
