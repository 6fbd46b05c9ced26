"""Fallback candidate arbitration + a built-in readability-style scorer.

Transcribed semantics from /root/reference/external.go:38-242. The
reference delegates to go-readability / go-domdistiller; those are whole
libraries, so here (per SURVEY.md §7.4) the built-in candidate is a
compact readability-style scorer (class/link-density weighted), and
callers may inject their own candidate trees via
``options.fallback_candidates`` (a list of Elements), mirroring
``Options.FallbackCandidates.Others``.
"""

from __future__ import annotations

import re

from . import etree, selectors
from .etree import Element
from .htmlprocessing import doc_cleaning, prune_unwanted_nodes
from .options import FAVOR_PRECISION, FAVOR_RECALL
from .settings import VALID_TAG_CATALOG
from .utils import trim

TAGS_TO_SANITIZE = frozenset(
    (
        "aside audio button fieldset figure footer iframe "
        "input label link nav noindex noscript "
        "object option select source svg time"
    ).split()
)


def compare_external_extraction(
    original_doc: Element, extracted_doc: Element, extracted_text: str, options
) -> tuple[Element, str]:
    """external.go:50-101."""
    extracted_text = trim(etree.iter_text(extracted_doc, " "))
    len_extracted = len(extracted_text)
    if options.focus == FAVOR_RECALL and len_extracted > options.config.min_extracted_size * 10:
        return extracted_doc, extracted_text

    cleaned_doc = etree.clone(original_doc, True)
    if options.focus == FAVOR_PRECISION:
        cleaned_doc = prune_unwanted_nodes(cleaned_doc, selectors.OVERALL_DISCARDED_CONTENT)

    for candidate_doc in _candidates(cleaned_doc, options):
        if candidate_doc is None:
            continue
        candidate_text = trim(etree.iter_text(candidate_doc, " "))
        len_candidate = len(candidate_text)

        if candidate_is_usable(candidate_doc, extracted_doc, len_candidate, len_extracted, options):
            extracted_doc, len_extracted = candidate_doc, len_candidate

        if len_extracted >= options.config.min_extracted_size:
            break

    sanitize_tree(extracted_doc, options)
    extracted_text = trim(etree.iter_text(extracted_doc, " "))
    return extracted_doc, extracted_text


def _candidates(cleaned_doc: Element, options):
    """external.go:103-161 — user candidates first, then the built-in
    readability-style scorer."""
    if options.fallback_candidates:
        for candidate in options.fallback_candidates:
            if candidate is not None:
                yield candidate
    yield readability_candidate(cleaned_doc, options)
    # Second slot (the reference's distiller position — external.go:141-158,
    # consulted only while the extraction is still below MinExtractedSize):
    # a boilerpipe-style block classifier, structurally different from the
    # readability scorer so it catches pages the first candidate misses.
    yield distiller_candidate(cleaned_doc)


def candidate_is_usable(
    candidate_doc: Element, extracted_doc: Element,
    len_candidate: int, len_extracted: int, options,
) -> bool:
    """external.go:164-202."""
    if len_candidate == 0 or len_candidate == len_extracted:
        usable = False
    elif len_extracted == 0 and len_candidate > 0:
        usable = True
    elif len_extracted > 2 * len_candidate:
        usable = False
    elif len_candidate > 2 * len_extracted:
        usable = True
    else:
        heads = etree.get_elements_by_tag(extracted_doc, "head")
        tables = etree.get_elements_by_tag(extracted_doc, "table")
        paragraphs = etree.get_elements_by_tag(extracted_doc, "p")
        headings = [
            el for tag in ("h2", "h3", "h4")
            for el in etree.get_elements_by_tag(candidate_doc, tag)
        ]

        p_text_length = sum(len(trim(etree.iter_text(p, " "))) for p in paragraphs)

        if p_text_length == 0 and len_candidate > options.config.min_extracted_size * 2:
            usable = True
        elif len(tables) > len(paragraphs) and len_candidate > options.config.min_extracted_size * 2:
            usable = True
        elif (
            options.focus == FAVOR_RECALL and not heads and headings
            and len_candidate > len_extracted
        ):
            usable = True
        else:
            usable = False

    must_favor_recall = (
        len_extracted < options.config.min_extracted_size and options.focus == FAVOR_RECALL
    )
    return usable or must_favor_recall


def sanitize_tree(tree: Element, options) -> None:
    """external.go:206-242."""
    doc_cleaning(tree, options)

    for el in reversed(etree.get_elements_by_tag(tree, "*")):
        if el.tag in TAGS_TO_SANITIZE and el.parent is not None:
            el.parent.children.remove(el)
            el.parent = None

    if not options.include_links:
        etree.strip_tags(tree, "a")
    etree.strip_tags(tree, "span")

    sanitization_list = []
    seen = set()
    for node in etree.get_elements_by_tag(tree, "*"):
        tag = node.tag
        if tag in seen:
            continue
        seen.add(tag)
        if tag not in VALID_TAG_CATALOG:
            sanitization_list.append(tag)
    if sanitization_list:
        etree.strip_tags(tree, *sanitization_list)


# ---------------------------------------------------------------------------
# Built-in readability-style candidate (original design, ~arc90 heuristics)
# ---------------------------------------------------------------------------

_POSITIVE = re.compile(
    r"(?i)article|body|content|entry|hentry|h-entry|main|page|pagination|post|text|blog|story"
)
_NEGATIVE = re.compile(
    r"(?i)-ad-|hidden|banner|combx|comment|com-|contact|foot|footer|footnote|gdpr|"
    r"masthead|media|meta|outbrain|promo|related|scroll|share|shoutbox|sidebar|"
    r"skyscraper|sponsor|shopping|tags|tool|widget"
)
_SCORE_TAGS = frozenset("p pre td blockquote".split())

# readability.js prep: strip unlikely candidates before scoring
_UNLIKELY = re.compile(
    r"(?i)-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|"
    r"agegate|pagination|pager|popup|yom-remote|share"
)
_OK_MAYBE = re.compile(r"(?i)and|article|body|column|content|main|shadow")
_DIV_BLOCK_CHILDREN = frozenset(
    "a blockquote dl div img ol p pre table ul select".split()
)


_BLOCK_LEVEL = frozenset(
    "p div section article li blockquote pre td h1 h2 h3 h4 h5 h6 dd dt".split()
)


def distiller_candidate(doc: Element) -> Element | None:
    """Boilerpipe/DOM-Distiller-style block classifier: flatten the page
    into leaf text blocks, keep blocks that look like prose (long text,
    low link density) plus short blocks sandwiched between kept ones
    (the classic NumWordsRules context rule), emit as <p> sequence."""
    body = etree.body_of(doc)
    if body is None:
        return None
    work = etree.clone(body, True)
    etree.strip_elements(work, False, "script", "style", "noscript", "template",
                         "iframe", "nav", "footer", "aside", "form")

    # Leaf blocks: block-level elements with no block-level children.
    blocks = []
    for el in etree.get_elements_by_tag(work, "*"):
        if el.tag not in _BLOCK_LEVEL:
            continue
        if any(c.tag in _BLOCK_LEVEL for c in etree.children_of(el)):
            continue
        text = trim(etree.text_content(el))
        if not text:
            continue
        n_words = len(text.split())
        link_text = sum(
            len(trim(etree.text_content(a)))
            for a in etree.get_elements_by_tag(el, "a")
        )
        if el.tag == "a":
            link_text = len(text)
        density = link_text / len(text)
        blocks.append((text, n_words, density, el.tag))

    if not blocks:
        return None

    # Primary classification: prose blocks
    keep = [
        (n_words >= 12 and density < 0.33) or (n_words >= 40 and density < 0.5)
        for (_t, n_words, density, _tag) in blocks
    ]
    # Context rule: short low-density blocks between two kept blocks
    for i in range(1, len(blocks) - 1):
        if not keep[i] and keep[i - 1] and keep[i + 1] and blocks[i][2] < 0.33:
            keep[i] = True

    kept = [b for b, k in zip(blocks, keep) if k]
    if not kept:
        return None
    out = etree.new_element("div")
    for text, _w, _d, tag in kept:
        el = etree.sub_element(out, "p" if tag not in ("h1", "h2", "h3", "h4", "h5", "h6", "pre", "blockquote") else tag)
        etree.set_text(el, text)
    return out


def readability_candidate(doc: Element, options=None) -> Element | None:
    """go-readability-shaped candidate: grabArticle with the library's
    retry pipeline (reference external.go:134-139 delegates to
    go-readability's FromDocument) — if the scored article is shorter
    than the 500-char threshold, retry with the strip-unlikelys and then
    the class-weight flag dropped, finally keeping the longest attempt."""
    body = etree.body_of(doc)
    if body is None:
        return None
    base = etree.clone(body, True)

    # prepDocument: drop non-content machinery before scoring
    etree.strip_elements(base, False, "script", "style", "noscript", "template", "iframe")
    if options is not None and options.exclude_tables:
        # Tables will be sanitized out of whatever candidate wins; a
        # table-farm page must not crowd out the prose it also carries.
        etree.strip_elements(base, False, "table")
    _replace_double_brs(base)

    best: Element | None = None
    best_len = -1
    for strip_unlikely, weight_classes, clean_conditionally in (
        (True, True, True), (False, True, True),
        (False, False, True), (False, False, False),
    ):
        out = _grab_article(
            etree.clone(base, True), strip_unlikely, weight_classes, clean_conditionally
        )
        if out is None:
            continue
        out_len = len(trim(etree.text_content(out)))
        if out_len >= 500:
            return out
        if out_len > best_len:
            best, best_len = out, out_len
    return best


def _mark_data_tables(root: Element) -> set:
    """readability.js _markDataTables: tables that present data (vs
    layout) are preserved by conditional cleaning."""
    data = set()
    for t in etree.get_elements_by_tag(root, "table"):
        if t.get("role") == "presentation" or t.get("datatable") == "0":
            continue
        if t.get("summary"):
            data.add(id(t))
            continue
        caps = etree.get_elements_by_tag(t, "caption")
        if caps and (caps[0].text or caps[0].children):
            data.add(id(t))
            continue
        if any(
            etree.get_elements_by_tag(t, tag)
            for tag in ("col", "colgroup", "tfoot", "thead", "th")
        ):
            data.add(id(t))
            continue
        if etree.get_elements_by_tag(t, "table"):
            continue
        rows = etree.get_elements_by_tag(t, "tr")
        ncols = max(
            (len(etree.get_elements_by_tag(r, "td")) for r in rows), default=0
        )
        if len(rows) >= 10 or ncols > 4 or len(rows) * ncols > 10:
            data.add(id(t))
    return data


def _clean_conditionally(root: Element, class_weight) -> None:
    """readability.js _cleanConditionally: drop form/fieldset/table/ul/
    div nodes whose shape says boilerplate (negative class weight, link
    farms, input clusters, bare embeds), keeping data tables and
    anything inside code blocks."""
    data_tables = _mark_data_tables(root)
    for tag in ("form", "fieldset", "table", "ul", "div"):
        for node in reversed(etree.get_elements_by_tag(root, tag)):
            if node.parent is None:
                continue  # inside an already-removed subtree
            if tag == "table" and id(node) in data_tables:
                continue
            anc = node.parent
            in_figure = False
            skip = False
            while anc is not None:
                if anc.tag == "table" and id(anc) in data_tables:
                    skip = True
                    break
                if anc.tag in ("code", "pre"):
                    skip = True
                    break
                if anc.tag == "figure":
                    in_figure = True
                anc = anc.parent
            if skip:
                continue
            weight = class_weight(node)
            if weight < 0:
                etree.remove(node, keep_tail=True)
                continue
            text = trim(etree.text_content(node))
            if text.count(",") + text.count("，") >= 10:
                continue
            p = len(etree.get_elements_by_tag(node, "p"))
            img = len(etree.get_elements_by_tag(node, "img"))
            li = len(etree.get_elements_by_tag(node, "li")) - 100
            inputs = len(etree.get_elements_by_tag(node, "input"))
            embeds = sum(
                len(etree.get_elements_by_tag(node, t))
                for t in ("object", "embed", "iframe")
            )
            link_len = sum(
                len(trim(etree.text_content(a)))
                for a in etree.get_elements_by_tag(node, "a")
            )
            density = (link_len / len(text)) if text else 0.0
            clen = len(text)
            is_list = tag == "ul"
            to_remove = (
                (img > 1 and p / img < 0.5 and not in_figure)
                or (not is_list and li > p)
                or (inputs > p // 3)
                or (
                    not is_list and clen < 25
                    and (img == 0 or img > 2) and not in_figure
                )
                or (not is_list and weight < 25 and density > 0.2)
                or (weight >= 25 and density > 0.5)
                or ((embeds == 1 and clen < 75) or embeds > 1)
            )
            if to_remove:
                etree.remove(node, keep_tail=True)


def _grab_article(work: Element, strip_unlikely: bool, weight_classes: bool,
                  clean_conditionally: bool = True) -> Element | None:
    """One grabArticle pass (readability.js heuristics, arc90 scoring)."""
    # Remove unlikely candidates (readability.js removeUnlikelyCandidates)
    if strip_unlikely:
        for el in reversed(etree.get_elements_by_tag(work, "*")):
            match_str = el.get("class") + " " + el.get("id")
            if (
                _UNLIKELY.search(match_str)
                and not _OK_MAYBE.search(match_str)
                and el.tag not in ("body", "a")
                and el.parent is not None
            ):
                etree.remove(el, keep_tail=True)

    # readability.js: wrap runs of phrasing content inside divs into <p>
    # (a div mixing bare text/inline tags with block children scores its
    # text through these synthetic paragraphs).
    for el in etree.get_elements_by_tag(work, "div"):
        _wrap_div_phrasing(el)

    # div → p transform for divs with no block-level children
    for el in reversed(etree.get_elements_by_tag(work, "div")):
        if not any(c.tag in _DIV_BLOCK_CHILDREN for c in etree.children_of(el)):
            el.tag = "p"

    def class_weight(el: Element) -> float:
        if not weight_classes:
            return 0.0
        w = 0.0
        idclass = el.get("class") + " " + el.get("id")
        if _NEGATIVE.search(idclass):
            w -= 25
        if _POSITIVE.search(idclass):
            w += 25
        return w

    # readability.js initializeNode tag weights
    _TAG_WEIGHT = {
        "div": 5, "pre": 3, "td": 3, "blockquote": 3,
        "address": -3, "ol": -3, "ul": -3, "dl": -3, "dd": -3, "dt": -3,
        "li": -3, "form": -3,
        "h1": -5, "h2": -5, "h3": -5, "h4": -5, "h5": -5, "h6": -5, "th": -5,
    }

    scores: dict[int, float] = {}
    by_id: dict[int, Element] = {}

    def _init(node: Element) -> int:
        nid = id(node)
        if nid not in scores:
            scores[nid] = class_weight(node) + _TAG_WEIGHT.get(node.tag, 0)
            by_id[nid] = node
        return nid

    for el in etree.get_elements_by_tag(work, "*"):
        if el.tag not in _SCORE_TAGS:
            continue
        text = trim(etree.text_content(el))
        if len(text) < 25:
            continue
        score = 1.0 + text.count(",") + min(len(text) / 100.0, 3.0)
        # parent full, grandparent half, further ancestors /(level*3)
        node = el.parent
        level = 0
        while node is not None and node.tag not in ("html", etree.DOCUMENT) and level < 5:
            divisor = 1.0 if level == 0 else (2.0 if level == 1 else level * 3.0)
            nid = _init(node)
            scores[nid] += score / divisor
            node = node.parent
            level += 1

    top: Element | None = None
    if scores:
        adjusted_scores: list[tuple[float, int]] = []
        for pid, score in scores.items():
            el = by_id[pid]
            text = trim(etree.text_content(el))
            link_text = sum(
                len(trim(etree.text_content(a)))
                for a in etree.get_elements_by_tag(el, "a")
            )
            density = (link_text / len(text)) if text else 1.0
            adjusted_scores.append((score * (1.0 - density), pid))
        adjusted_scores.sort(key=lambda t: -t[0])

        # A candidate that swallows most of the page is no candidate:
        # prefer the best-scoring one under 70% of the page text
        # (stands in for readability's conditional cleaning, which
        # trims whole-page winners down to the article).
        page_len = len(trim(etree.text_content(work))) or 1
        best_score, best_id = adjusted_scores[0]
        for score_i, pid_i in adjusted_scores[:5]:
            if score_i <= 0:
                break
            cand_len = len(trim(etree.text_content(by_id[pid_i])))
            if cand_len <= 0.7 * page_len:
                best_score, best_id = score_i, pid_i
                break
        if best_score > 0:
            top = by_id[best_id]

    out = etree.new_element("div")
    if top is None or top is work:
        for child in list(work.children):
            etree.append(out, child)
    else:
        # readability.js's score-based parent walk-up was tried here and
        # measured a wash on the comparison corpus (F 0.9102 vs 0.9099)
        # while regressing a transcribed reference expectation
        # (speicherguide: the walk climbs into a related-links
        # container) — omitted deliberately.

        # readability.js: while the top candidate is an only child, use
        # its parent (sibling joining then sees adjacent content).
        while (
            top.parent is not None
            and top.parent is not work
            and top.parent.tag not in ("body", "html", etree.DOCUMENT)
            and len(etree.children_of(top.parent)) == 1
        ):
            top = top.parent

        best = scores.get(id(top), best_score)
        sibling_threshold = max(10.0, best * 0.2)
        parent = top.parent
        if parent is not None:
            for sibling in list(etree.children_of(parent)):
                append_it = False
                if sibling is top:
                    append_it = True
                else:
                    sib_score = scores.get(id(sibling))
                    if sib_score is not None and sib_score >= sibling_threshold:
                        append_it = True
                    elif sibling.tag == "p":
                        text = trim(etree.text_content(sibling))
                        link_text = sum(
                            len(trim(etree.text_content(a)))
                            for a in etree.get_elements_by_tag(sibling, "a")
                        )
                        density = (link_text / len(text)) if text else 0.0
                        if len(text) > 80 and density < 0.25:
                            append_it = True
                        elif 0 < len(text) <= 80 and density == 0 and re.search(r"\.( |$)", text):
                            append_it = True
                if append_it:
                    etree.append(out, sibling)
        else:
            etree.append(out, top)

    # readability's conditional cleaning (prepArticle) — the flag drops
    # on the last retry, like FLAG_CLEAN_CONDITIONALLY
    if clean_conditionally:
        _clean_conditionally(out, class_weight)

    # readability's empty-paragraph cleanup
    for p in reversed(etree.get_elements_by_tag(out, "p")):
        if trim(etree.text_content(p)) == "" and not etree.get_elements_by_tag(p, "img"):
            etree.remove(p)

    return out


_PHRASING = frozenset(
    "a abbr b bdo br cite code dfn em i img kbd label mark q s samp small "
    "span strike strong sub sup tt u var wbr time font".split()
)


def _wrap_div_phrasing(node: Element) -> None:
    """readability.js grabArticle: inside a div that mixes loose phrasing
    content (text, inline tags, brs) with block children, wrap each
    phrasing run into a synthetic <p> so its text takes part in scoring."""
    kids = node.children
    if not kids:
        return
    has_block = any(
        c.tag not in _PHRASING and c.tag != etree.COMMENT for c in kids
    )
    if not has_block:
        return

    items: list = []
    if node.text:
        items.append(("#text", node.text))
    for child in kids:
        items.append(("el", child))
        if child.tail:
            items.append(("#text", child.tail))
            child.tail = ""
    node.text = ""
    node.children = []

    p: Element | None = None
    prev: Element | None = None

    def _emit_direct(kind, val):
        nonlocal p, prev
        if kind == "#text":
            if node.children:
                node.children[-1].tail += val
            else:
                node.text += val
        else:
            val.parent = node
            node.children.append(val)

    for kind, val in items:
        is_phrasing = kind == "#text" or val.tag in _PHRASING or val.tag == etree.COMMENT
        if not is_phrasing:
            _emit_direct(kind, val)
            p = None
            prev = None
            continue
        if p is None:
            # don't open a paragraph for bare whitespace / stray brs
            if kind == "#text" and not val.strip():
                _emit_direct(kind, val)
                continue
            if kind == "el" and val.tag in ("br", etree.COMMENT):
                _emit_direct(kind, val)
                continue
            p = Element("p")
            p.parent = node
            node.children.append(p)
            prev = None
        if kind == "#text":
            if prev is None:
                p.text += val
            else:
                prev.tail += val
        else:
            val.parent = p
            p.children.append(val)
            prev = val


def _replace_double_brs(root: Element) -> None:
    """readability.js _replaceBrs: runs of ≥2 <br> split the enclosing
    element's inline content into <p> paragraphs (phrasing content only;
    block elements stay direct children)."""
    for node in etree.iter_all(root):
        brs = [c for c in node.children if c.tag == "br"]
        if len(brs) < 2:
            continue
        items: list = []
        if node.text:
            items.append(("#text", node.text))
        for child in node.children:
            items.append(("el", child))
            if child.tail:
                items.append(("#text", child.tail))
                child.tail = ""

        segments: list[list] = [[]]
        i = 0
        while i < len(items):
            kind, val = items[i]
            if kind == "el" and val.tag == "br":
                j = i
                n_br = 0
                while j < len(items):
                    k2, v2 = items[j]
                    if k2 == "el" and v2.tag == "br":
                        n_br += 1
                        j += 1
                    elif k2 == "#text" and not v2.strip():
                        j += 1
                    else:
                        break
                if n_br >= 2:
                    segments.append([])
                    i = j
                    continue
            segments[-1].append(items[i])
            i += 1

        if len(segments) < 2:
            # restore the original stream
            node.children = []
            node.text = ""
            prev = None
            for kind, val in items:
                if kind == "#text":
                    if prev is None:
                        node.text += val
                    else:
                        prev.tail += val
                else:
                    val.parent = node
                    node.children.append(val)
                    prev = val
            continue

        node.text = ""
        node.children = []
        for seg in segments:
            has_content = any(
                (k == "#text" and v.strip()) or (k == "el" and v.tag != "br")
                for k, v in seg
            )
            if not has_content:
                continue
            p = None
            prev = None
            for kind, val in seg:
                if kind == "el" and val.tag not in _PHRASING:
                    val.parent = node
                    node.children.append(val)
                    p = None
                    prev = None
                    continue
                if p is None:
                    p = Element("p")
                    p.parent = node
                    node.children.append(p)
                    prev = None
                if kind == "#text":
                    if prev is None:
                        p.text += val
                    else:
                        prev.tail += val
                else:
                    val.parent = p
                    p.children.append(val)
                    prev = val
