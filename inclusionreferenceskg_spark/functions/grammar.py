"""The inclusion-reference regex grammar and detector.

The composed pattern below is the *specification* of what constitutes a
reference mention ("Article 6(1) of Regulation (EU) 2016/679", "Articles 12
to 15 of that Directive", ...) and is reproduced structurally from the
reference (``reference_detection/regex_reference_detector.py:18-59`` with
building blocks from ``util/regex_util.py:1-10``).  We keep Python ``re``
semantics (inline ``(?-i:...)`` groups, backtracking) inside the pandas UDF
rather than translating to Java ``regexp_extract_all`` — guaranteed-identical
matches matter more than keeping this one expression JVM-side, and the regex
is compiled once per executor at module import.

Detection runs per node content (the resolution path of the reference does
exactly this, ``evaluate_reference_resolver.py:26-28``); a mention row is
``(start, text)`` relative to the node's content.
"""

from __future__ import annotations

import re
from typing import Dict, List

# ---- building blocks (util/regex_util.py) ----
NUMBER = r"(?:[1-9][0-9]*)"
ALPHA = r"(?:\((?:[a-z]|ii)\))"
PARAGRAPH = fr"(?:\({NUMBER}\))"
ORDINAL = r"(?:first|second|third|fourth|fifth|sixth)"
# deliberately sloppy: matches only the first few roman numerals and a lot of
# illegal ones; case-sensitive by design (regex_util.py:7)
ROMAN = r"(?-i:[IXV]+)"
CONJUNCTION = r"(?:and|or)"

# ---- ranges and lists (regex_reference_detector.py:18-26) ----
_number_or_range = fr"(?:{NUMBER}(?:\sto\s{NUMBER})?)"
_paragraph_or_range = fr"(?:{PARAGRAPH}(?:\sto\s{PARAGRAPH})?)"
_alpha_or_range = fr"(?:{ALPHA}(?:\sto\s{ALPHA})?)"
_roman_or_range = fr"(?:{ROMAN}(?:\sto\s{ROMAN})?)"

NUMBERS = fr"(?:{_number_or_range}(?:,\s{_number_or_range})*(?:\s{CONJUNCTION}\s{_number_or_range})*)"
PARAGRAPHS = fr"(?:{_paragraph_or_range}(?:,\s{_paragraph_or_range})*(?:\s{CONJUNCTION}\s{_paragraph_or_range})*)"
ALPHAS = fr"(?:{_alpha_or_range}(?:,\s{_alpha_or_range})*(?:\s{CONJUNCTION}\s{_alpha_or_range})*)"
ROMANS = fr"(?:{_roman_or_range}(?:,\s{_roman_or_range})*(?:\s{CONJUNCTION}\s{_roman_or_range})*)"

THEREOF = r"(?:\sthereof)?"

# ---- EU document numbering, e.g. "(EU) No 123/2016/EC"
# (regex_reference_detector.py:31-32; publications.europa.eu/code/en/en-110202.htm)
DOC_NUMBERING = r"(?:(?:\s\(\w{2,7}\))?(?:\sNo)?\s[1-9][0-9]*(?:\/[1-9][0-9]*)?(?:\/\w{2,7}))"
DOC_NUMBERING_PLURAL = fr"(?:{DOC_NUMBERING}(?:,{DOC_NUMBERING})*(?:\s{CONJUNCTION}{DOC_NUMBERING})*)"

REGULATION = fr"(?:(?:Commission\s)?Regulations?{DOC_NUMBERING_PLURAL})"
DIRECTIVE = fr"(?:(?:(?:the\s{ORDINAL}\s)?Council\s)?(?-i:Directive|Decision)s?{DOC_NUMBERING_PLURAL})"
TREATY = r"(?:the\streaty\s(?:\w*\s)+(?-i:[A-Z]\w*)|the\s(?-i:[A-Z]{2,}))"

DOCUMENT = fr"(?:(?:{REGULATION}|{DIRECTIVE}|{TREATY})|(?:this\s|that\s)(?-i:Regulation|Treaty|Directive|Decision))"

NODE_NAME_DECIMAL = r"(?:article|paragraph|subparagraph|sentence|indent)"
NODE_NAME_ROMAN = r"(?:chapter|title|section)"
NODE_NAME = fr"(?:{NODE_NAME_ROMAN}|{NODE_NAME_DECIMAL})"

SINGLE = (
    fr"(?:article\s{NUMBER}{PARAGRAPH}{THEREOF}|"
    fr"(?:this|that|the\sprevious)\s{NODE_NAME}|"
    fr"{NODE_NAME}\s{NUMBER}{THEREOF}|"
    fr"{NODE_NAME_ROMAN}\s{ROMAN}{THEREOF}|"
    fr"(?:the\s)?{ORDINAL}\s{NODE_NAME}{THEREOF}|"
    fr"{DOCUMENT}|"
    fr"point\s{ALPHA})"
)
MULTI = (
    fr"(?:article\s{NUMBER}{PARAGRAPHS}{THEREOF}|"
    fr"{NODE_NAME_DECIMAL}\s{NUMBER}{ALPHAS}{THEREOF}|"
    fr"{NODE_NAME_DECIMAL}s?\s{NUMBERS}{THEREOF}|"
    fr"{NODE_NAME_ROMAN}s?\s{ROMANS}{THEREOF}|"
    fr"those\s{NODE_NAME}s|"
    fr"points?\s{ALPHAS})"
)

REFERENCE = fr"(?i)(?:{MULTI}|{SINGLE})(?:(?:\sof)?\s{SINGLE})*"

_PATTERN = re.compile(REFERENCE, re.I)


def detect(text: str) -> List[Dict]:
    """Find reference mentions; returns [{'start': int, 'text': str}, ...]."""
    return [
        {"start": m.start(), "text": m.group()} for m in _PATTERN.finditer(text)
    ]
