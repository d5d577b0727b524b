from inclusionreferenceskg_spark.functions.numbering import alph_to_dec, rom_to_dec


def test_roman_numerals():
    # table lifted from the reference's tests/util/test_util.py
    cases = {
        "I": 1, "II": 2, "III": 3, "IV": 4, "V": 5, "VI": 6, "VII": 7,
        "VIII": 8, "IX": 9, "X": 10, "XL": 40, "XC": 90, "CD": 400,
        "CM": 900, "MMXXII": 2022, "MCMLXXXIV": 1984,
    }
    for numeral, value in cases.items():
        assert rom_to_dec(numeral) == value, numeral


def test_roman_lowercase_is_tolerated():
    # deviation from the reference (which raises KeyError): robustness at scale
    assert rom_to_dec("iv") == 4


def test_alpha():
    assert alph_to_dec("a") == 1
    assert alph_to_dec("h") == 8
    assert alph_to_dec("i") == 9
    assert alph_to_dec("ii") == 10
    assert alph_to_dec("z") == 26
