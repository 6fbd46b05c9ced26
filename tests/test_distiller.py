"""DOM-Distiller fallback pipeline (distiller.py — the go-domdistiller
slot, reference external.go:141-158; filter semantics from the public
boilerpipe/dom-distiller ArticleExtractor lineage)."""

from go_trafilatura_spark import etree
from go_trafilatura_spark.distiller import (
    HEADING, INDICATES_END_OF_TEXT, LI, MIGHT_BE_CONTENT, TITLE,
    VERY_LIKELY_CONTENT, TextBlock, _Builder, block_proximity_fusion,
    distill, document_title_match, expand_title_to_content,
    ignore_blocks_after_content, keep_largest_block, list_at_end_filter,
    num_words_rules_classifier, potential_titles,
    similar_sibling_content_expansion, terminating_blocks_finder,
)


def _block(words, anchor=0, level=1, offset=0, text=None):
    t = text if text is not None else " ".join(["w"] * words)
    tb = TextBlock(t, words, anchor, level, offset, [], None, "p")
    return tb


def _blocks_of(html: bytes):
    b = _Builder()
    b.walk(etree.body_of(etree.parse_html(html)))
    return b.blocks


# -- DOM conversion ---------------------------------------------------------

def test_builder_blocks_at_block_boundaries():
    blocks = _blocks_of(
        b"<body><div>intro text here <p>inner para words</p> trailing "
        b"text</div></body>")
    texts = [tb.text for tb in blocks]
    assert texts == ["intro text here", "inner para words", "trailing text"]
    # the p is one level deeper than the div-held runs
    assert blocks[1].tag_level == blocks[0].tag_level + 1


def test_builder_inline_keeps_flow_and_counts_anchor_words():
    blocks = _blocks_of(
        b"<body><p>alpha <a href='x'>beta gamma</a> <b>delta</b></p></body>")
    assert len(blocks) == 1
    tb = blocks[0]
    assert tb.text == "alpha beta gamma delta"
    assert tb.num_words == 4
    assert tb.num_anchor_words == 2
    assert abs(tb.link_density - 0.5) < 1e-9


def test_builder_skips_hidden_and_script():
    blocks = _blocks_of(
        b"<body><p style='display:none'>ghost</p><script>x()</script>"
        b"<p hidden>gone</p><p>real words</p></body>")
    assert [tb.text for tb in blocks] == ["real words"]


def test_builder_li_label_and_output_tag():
    blocks = _blocks_of(b"<body><ul><li>item one</li></ul></body>")
    assert blocks[0].has_label(LI)
    assert blocks[0].out_elements[0].tag == "li"


def test_builder_heading_label():
    blocks = _blocks_of(b"<body><h2>Section title</h2><p>body</p></body>")
    assert blocks[0].has_label(HEADING)
    assert not blocks[1].has_label(HEADING)


# -- NumWordsRulesClassifier (published decision-tree constants) ------------

def test_numwords_high_link_density_is_boilerplate():
    blocks = [_block(50, anchor=20)]
    num_words_rules_classifier(blocks)
    assert not blocks[0].is_content


def test_numwords_long_block_is_content():
    blocks = [_block(17)]
    num_words_rules_classifier(blocks)
    assert blocks[0].is_content


def test_numwords_short_block_promoted_by_next():
    blocks = [_block(3), _block(16)]
    num_words_rules_classifier(blocks)
    assert blocks[0].is_content  # next.num_words > 15


def test_numwords_after_linky_prev_needs_more_words():
    prev = _block(10, anchor=6)  # link density 0.6 > 0.555556
    blocks = [prev, _block(30), _block(5)]
    num_words_rules_classifier(blocks)
    assert not blocks[1].is_content  # 30 <= 40 words, next 5 <= 17
    blocks = [prev, _block(41), _block(5)]
    num_words_rules_classifier(blocks)
    assert blocks[1].is_content      # 41 > 40 clears the linky-prev bar


# -- Title matching ---------------------------------------------------------

def test_potential_titles_splits_separators():
    t = potential_titles("My Great Article - Example Site")
    assert "My Great Article" in t


def test_document_title_match_labels_block():
    blocks = [_block(3, text="My Great Article")]
    document_title_match(blocks, ["My Great Article - Example Site"])
    assert blocks[0].has_label(TITLE)


# -- Terminating blocks -----------------------------------------------------

def test_terminating_blocks():
    b1 = _block(2, text="Comments (14)")
    b2 = _block(5, text="Please rate this article now")
    b3 = _block(20, text=" ".join(["real"] * 20))
    terminating_blocks_finder([b1, b2, b3])
    assert b1.has_label(INDICATES_END_OF_TEXT)
    assert b2.has_label(INDICATES_END_OF_TEXT)
    assert not b3.has_label(INDICATES_END_OF_TEXT)


def test_ignore_blocks_after_content():
    blocks = [_block(70), _block(3, text="comments"), _block(30)]
    for tb in blocks:
        tb.is_content = True
    terminating_blocks_finder(blocks)
    ignore_blocks_after_content(blocks, 60)
    assert blocks[0].is_content
    assert not blocks[2].is_content


# -- Fusion / keep-largest --------------------------------------------------

def test_block_proximity_fusion_merges_adjacent_content():
    a = _block(20, offset=0)
    b = _block(20, offset=1)
    a.is_content = b.is_content = True
    out, changed = block_proximity_fusion([a, b], 1, False, False)
    assert changed and len(out) == 1
    assert out[0].num_words == 40


def test_keep_largest_block_expands_same_tag_level():
    a = _block(30, level=2, offset=0)
    big = _block(200, level=2, offset=1)
    deep = _block(30, level=3, offset=2)
    shallow = _block(30, level=1, offset=3)
    for tb in (a, big, deep, shallow):
        tb.is_content = True
    keep_largest_block([a, big, deep, shallow])
    assert big.is_content and big.has_label(VERY_LIKELY_CONTENT)
    assert a.is_content            # same tag level → kept
    assert not shallow.is_content  # lower level breaks the walk
    assert deep.has_label(MIGHT_BE_CONTENT)


def test_expand_title_to_content():
    title = _block(4, text="The Title", offset=0)
    title.labels.add(TITLE)
    mid = _block(5, offset=1)
    mid.labels.add(MIGHT_BE_CONTENT)
    body = _block(80, offset=2)
    body.is_content = True
    expand_title_to_content([title, mid, body])
    assert mid.is_content


def test_list_at_end_filter():
    big = _block(200, level=2, offset=0)
    big.is_content = True
    big.labels.add(VERY_LIKELY_CONTENT)
    li = _block(4, level=3, offset=1)
    li.labels.update((MIGHT_BE_CONTENT, LI))
    list_at_end_filter([big, li])
    assert li.is_content


def test_similar_sibling_expansion_same_parent_tag():
    key = object()
    a = _block(40, offset=0)
    a.is_content = True
    a.parent_key = id(key)
    b = _block(6, offset=1)
    b.parent_key = id(key)
    c = _block(6, offset=2)
    c.parent_key = 12345  # different DOM parent → not a sibling
    similar_sibling_content_expansion(
        [a, b, c], allow_cross_headings=True,
        max_link_density=0.5, max_block_distance=10)
    assert b.is_content
    assert not c.is_content


# -- End-to-end -------------------------------------------------------------

_PAGE = b"""<html><head><title>My Great Article - Example Site</title></head>
<body>
<nav><a href="/">Home</a> <a href="/a">News</a> <a href="/b">Sports</a></nav>
<div id="main">
<h1>My Great Article</h1>
<p>This is the first paragraph of the article body with plenty of words to
make it count as content under the number of words rules classifier.</p>
<p>Short middle.</p>
<p>This is the second long paragraph of genuine article prose, again holding
more than sixteen words so that the classifier marks it as content.</p>
</div>
<div class="related"><a href="x">Related one</a><br><a href="y">Related two</a></div>
<p>comments</p>
<footer>Copyright 2026 Example Site. All rights reserved.</footer>
</body></html>"""


def test_distill_keeps_article_drops_boilerplate():
    res = distill(etree.parse_html(_PAGE))
    assert res is not None
    text = etree.iter_text(res, " ")
    assert "first paragraph of the article" in text
    assert "Short middle." in text           # sandwiched block kept
    assert "My Great Article" in text        # heading fused/kept
    assert "Related one" not in text
    assert "Home" not in text
    assert "Copyright" not in text


def test_distill_empty_page_returns_none():
    assert distill(etree.parse_html(b"<body></body>")) is None
    assert distill(etree.parse_html(
        b"<body><nav><a href='/'>x</a></nav></body>")) is None


def test_distill_preserves_inline_markup():
    res = distill(etree.parse_html(
        b"<body><article><p>Long enough paragraph with <b>bold words</b> and "
        b"<a href='u'>a link</a> inside it, exceeding the sixteen word "
        b"threshold for content easily today.</p></article></body>"))
    assert res is not None
    assert etree.get_elements_by_tag(res, "b")
    assert etree.get_elements_by_tag(res, "a")


def test_fallback_slot_overrides():
    # FallbackCandidates.Readability/Distiller (core-options.go:181-199)
    # replace the built-in extractors in their slots.
    import go_trafilatura_spark as gts
    marker = ("Prose long enough to clear the minimum extracted size gate "
              "when the override candidate is accepted by arbitration, with "
              "plenty of additional filler words to comfortably exceed two "
              "hundred and fifty characters of running text in this single "
              "paragraph of the injected override document for the test.")
    override = etree.new_element("div")
    p = etree.sub_element(override, "p")
    etree.set_text(p, marker)
    # page whose own extraction comes up empty -> fallback decides
    html = b"<html><body><div><a href='/'>nav</a></div></body></html>"
    res = gts.extract(html, gts.Options(
        enable_fallback=True, fallback_distiller=override,
        fallback_readability=etree.new_element("div"),
        has_essential_metadata=False))
    assert marker.split()[0] in res.content_text
