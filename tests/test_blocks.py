from inclusionreferenceskg_spark.functions.blocks import (
    append_footnotes,
    blockize,
    delete_footnotes,
    drop_header_blocks,
    fix_glued_numbering,
    preprocess,
)


def test_blockize_strips_joins_and_drops_soft_hyphens():
    text = "first block\ncontinues here\n\n\n  \n\nsec­ond"
    assert blockize(text) == ["first block continues here", "second"]


def test_blockize_keeps_curly_quotes():
    assert blockize("‘lawfulness’") == ["‘lawfulness’"]


def test_header_blocks_dropped_only_when_anchored():
    blocks = [
        "4.5.2016 L 119/35 Official Journal of the European Union EN",
        "mentions a date 4.5.2016 later",
    ]
    assert drop_header_blocks(blocks) == ["mentions a date 4.5.2016 later"]


def test_glued_numbering_gets_space():
    assert fix_glued_numbering(["1.Text", "(2)Text", "3. fine", "x1.y"]) == [
        "1. Text", "(2) Text", "3. fine", "x1.y",
    ]


def test_footnote_append_moves_block_to_marker():
    blocks = [
        "Directive 95/46/EC (1) seeks to harmonise",
        "unrelated",
        "(1) OJ L 281, 23.11.1995, p. 31.",
    ]
    assert append_footnotes(blocks) == [
        "Directive 95/46/EC (1) seeks to harmonise (1) OJ L 281, 23.11.1995, p. 31.",
        "unrelated",
    ]


def test_footnote_append_skips_excluded_lookbehind():
    # ` (1)` preceded by "and" or "..,`" is a paragraph reference, not a marker
    blocks = [
        "paragraphs 2 and (1) of something",
        "(1) OJ L 281",
    ]
    # no eligible marker -> the footnote block stays in place
    assert append_footnotes(blocks) == blocks


def test_footnote_delete_removes_matched_footnote():
    blocks = [
        "Directive 95/46/EC (1) seeks to harmonise",
        "(1) OJ L 281, 23.11.1995, p. 31.",
    ]
    assert delete_footnotes(blocks) == ["Directive 95/46/EC (1) seeks to harmonise"]


def test_default_chain_order():
    text = "4.5.2016 L 1/1 header\n\n1.Glued text (1) cite\n\n(1) OJ footnote"
    assert preprocess(text) == ["1. Glued text (1) cite (1) OJ footnote"]
