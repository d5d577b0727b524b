"""Numbering-system conversions used by document parsing and resolution.

Semantics mirror the reference implementation
(``inclusionreferenceskg/src/util/util.py:4-49``): roman numerals are
evaluated right-to-left with subtractive notation; alphabetic point labels
map ``a -> 1 ... z -> 26`` with the single special case ``ii -> 10`` (EU
documents use ``(i)``/``(ii)`` as the 9th/10th point labels after ``(h)``).

Deliberate deviation (documented): we uppercase roman numerals before
conversion.  The reference raises ``KeyError`` on lowercase input; at web
scale a malformed page must not kill an executor.  On the reference corpus
(all-uppercase numerals, enforced by the case-sensitive ``(?-i:[IXV]+)``
chapter regex) behavior is identical.
"""

from __future__ import annotations

_ROMAN_VALUES = {
    "": 0,
    "I": 1,
    "V": 5,
    "X": 10,
    "L": 50,
    "C": 100,
    "D": 500,
    "M": 1000,
}


def rom_to_dec(numeral: str) -> int:
    """Convert a roman numeral to an int (undefined for malformed input)."""
    total = 0
    previous = ""
    for ch in reversed(numeral.upper()):
        if _ROMAN_VALUES[previous] > _ROMAN_VALUES[ch]:
            total -= _ROMAN_VALUES[ch]
        else:
            total += _ROMAN_VALUES[ch]
        previous = ch
    return total


def alph_to_dec(label: str) -> int:
    """Convert an alphabetic point label to an int (``a``->1, ``ii``->10)."""
    if label == "ii":
        return 10
    if len(label) != 1:
        raise ValueError(
            f"alphabetic numbering must be 'ii' or a single character, got {label!r}"
        )
    return ord(label) - 96
