"""JVM twin of the path-confirm automaton: operators/resolve._path_confirm.

tests/test_pathmatch.py pins the Python automaton; this file pins the
vectorized SQL expression that actually runs in the resolve join, element
by element.  Regression coverage requested by the round-3 verdict: lenient
Document-title containment (reference node/document.py:17-27) must be
evaluated AT CONFIRM TIME — a qualifier whose Document element's title is
a substring of (or contains) the candidate's Document title confirms, and
an UNRELATED non-null title must NOT (guards against any vacuous
"non-null title passes" disjunct creeping into the expression).
"""

from pyspark.sql import types as T

from inclusionreferenceskg_spark.operators.resolve import _path_confirm
from inclusionreferenceskg_spark.schema import PATH_ELEMENT, PATTERN_ELEMENT

SCHEMA = T.StructType([
    T.StructField("case", T.StringType()),
    T.StructField("qualifier", T.ArrayType(PATTERN_ELEMENT)),
    T.StructField("cand_path", T.ArrayType(PATH_ELEMENT)),
])


def q(t, n=None, title=None):
    return {"node_type": t, "number": n, "title": title, "ref_url": None}


def p(t, n=None, title=None):
    return {"node_type": t, "number": n, "title": title}


GDPR = [p("Document", None, "General Data Protection Regulation"),
        p("Chapter", 4), p("Article", 30)]
TITLED_ART = [p("Document", None, "GDPR"),
              p("Article", 30, "Records of processing activities")]

# (case, qualifier pattern, candidate path, must_confirm)
CASES = [
    # lenient Document title: containment in either direction
    ("doc_title_q_in_p",
     [q("Document", title="data protection"), q("Article", 30)], GDPR, True),
    ("doc_title_p_in_q",
     [q("Document",
        title="the General Data Protection Regulation of 2016"),
      q("Article", 30)], GDPR, True),
    # the verdict's regression: an unrelated non-null Document title must
    # NOT confirm — containment has to actually be evaluated
    ("doc_title_unrelated",
     [q("Document", title="Treaty on European Union"), q("Article", 30)],
     GDPR, False),
    ("doc_title_acronym_not_substring",
     [q("Document", title="GDPR"), q("Article", 30)], GDPR, False),
    ("doc_title_exact",
     [q("Document", title="General Data Protection Regulation"),
      q("Article", 30)], GDPR, True),
    ("doc_title_null", [q("Document"), q("Article", 30)], GDPR, True),
    ("doc_title_wildcard",
     [q("Document", title="-1"), q("Article", 30)], GDPR, True),
    # non-Document titles are exact-only (reference node/node.py, no
    # leniency outside Document._pattern_match)
    ("art_title_exact",
     [q("Article", 30, "Records of processing activities")],
     TITLED_ART, True),
    ("art_title_containment_rejected",
     [q("Article", 30, "records")], TITLED_ART, False),
    # numbers: exact / wildcard / mismatch
    ("number_wildcard", [q("Article", -1)], GDPR, True),
    ("number_mismatch", [q("Article", 31)], GDPR, False),
    # Root is consumed by the virtual corpus root, never by the path
    ("root_consumed",
     [q("Root"), q("Document", title="data protection"), q("Article", 30)],
     GDPR, True),
    # gaps between matched elements are allowed (Chapter skipped)
    ("gap_allowed",
     [q("Document", title="data protection"), q("Article", 30)], GDPR,
     True),
    ("inner_number_checked",
     [q("Chapter", 5), q("Article", 30)], GDPR, False),
]


def test_confirm_expression_semantics(spark):
    df = spark.createDataFrame(
        [(name, qual, path) for name, qual, path, _ in CASES], SCHEMA)
    confirmed = {r["case"] for r in df.filter(_path_confirm()).collect()}
    for name, _, _, want in CASES:
        assert (name in confirmed) == want, name
