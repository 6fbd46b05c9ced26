"""text_index parity: the one-pass trimmed-length / Euler-interval /
anchor index must agree exactly with the naive per-node computations on
arbitrary parsed trees (it backs the readability candidate loop and
delete_by_link_density, where results are pinned byte-exact)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bisect import bisect_right

from hypothesis import given, settings, strategies as st

from go_trafilatura_spark import etree
from go_trafilatura_spark.utils import trim


def _check_tree(root):
    tl, enter, lastd, anchors, apos = etree.text_index(root)
    stack = [root]
    all_nodes = []
    while stack:
        n = stack.pop()
        all_nodes.append(n)
        stack.extend(n.children)
    for node in all_nodes:
        assert tl[id(node)] == len(trim(etree.text_content(node))), node.tag
        lo = bisect_right(apos, enter[id(node)])
        hi = bisect_right(apos, lastd[id(node)])
        assert anchors[lo:hi] == etree.get_elements_by_tag(node, "a"), node.tag


def test_text_index_fixture_pages():
    html = (b"<html><body><div id=a>Hello <a href='#x'>l i n k</a> tail"
            b"<p>Para <b>bold</b>\n\n  spaced   </p><!--c-->after"
            b"<ul><li><a href='/y'>y</a></li><li>plain</li></ul></div>"
            b"<div>empty  \t </div><a>outer<a>inner</a></a></body></html>")
    _check_tree(etree.parse_html(html))


_WORDS = st.sampled_from(["foo", "b ar", "  ", "", "x\ty", "été", "a"])
_TAGS = st.sampled_from(["div", "p", "a", "span", "ul", "li", "b"])


@st.composite
def _tree(draw, depth=3):
    el = etree.Element(draw(_TAGS))
    el.text = draw(_WORDS)
    if depth > 0:
        for _ in range(draw(st.integers(0, 3))):
            c = draw(_tree(depth=depth - 1))
            c.tail = draw(_WORDS)
            c.parent = el
            el.children.append(c)
    return el


@settings(max_examples=120, deadline=None)
@given(_tree())
def test_text_index_random_trees(root):
    _check_tree(root)
