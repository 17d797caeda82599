"""Unit tests for A5 tokenizer + A6 Kohlschütter classifier."""

from text_extraction_spark.engine.boilerplate import classify, extract_main
from text_extraction_spark.engine.textproc import Block, tokenize


def test_tokenize_blocks_and_words():
    blocks = tokenize("<p>one two three</p><div>four</div>")
    assert [(b.text, b.words) for b in blocks] == [("one two three", 3), ("four", 1)]


def test_tokenize_link_words():
    blocks = tokenize('<div><a href="#">home about</a> plain</div>')
    assert len(blocks) == 1
    assert blocks[0].words == 3 and blocks[0].link_words == 2


def test_tokenize_blank_line_is_block_break():
    blocks = tokenize("alpha beta\n\n  gamma")
    assert [b.text for b in blocks] == ["alpha beta", "gamma"]


def test_tokenize_nested_and_header_tags():
    blocks = tokenize("<h2>Title Words Here</h2><p>body <b>bold</b> text</p>")
    assert [b.text for b in blocks] == ["Title Words Here", "body bold text"]


def test_tokenize_empty_and_tag_only():
    assert tokenize("") == []
    assert tokenize("<p></p><div></div>") == []


def _b(words: int, link: int = 0) -> Block:
    return Block(text=" ".join(["w"] * words), words=words, link_words=link)


def test_classifier_high_link_density_is_boilerplate():
    # link density 1/2 > 1/3 → boilerplate regardless of neighbors
    assert classify([_b(40), _b(8, 4), _b(40)])[1] is False


def test_classifier_exact_one_third_is_content_side():
    # link density exactly 1/3 is NOT > 1/3 → falls through to word rules
    assert classify([_b(30, 10)])[0] is True


def test_classifier_long_block_is_content():
    assert classify([_b(17)]) == [True]
    assert classify([_b(16)]) == [False]  # short, no supporting context


def test_classifier_short_block_with_long_next_is_content():
    assert classify([_b(5), _b(20)]) == [True, True]


def test_classifier_short_block_with_prev_support():
    # prev.words > 4 rescues a short block
    assert classify([_b(5), _b(6)]) == [False, True]


def test_classifier_high_link_prev_branch():
    # prev link density 3/4 > 5/9 → curr needs > 40 words (next is short)
    prev = _b(4, 3)
    assert classify([prev, _b(40)])[1] is False
    assert classify([prev, _b(41)])[1] is True


def test_extract_main_drops_boilerplate():
    html = (
        "<p>" + " ".join(["word"] * 20) + "</p>"
        '<div><a href="#">home</a> menu</div>'
        "<p>" + " ".join(["tail"] * 20) + "</p>"
    )
    out = extract_main(html)
    assert "home" not in out and "menu" not in out
    assert out.startswith("word") and out.endswith("tail")


def test_extract_main_all_boilerplate_empty():
    assert extract_main('<div><a href="#">home about</a> login faq</div>') == ""
