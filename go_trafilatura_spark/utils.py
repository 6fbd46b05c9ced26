"""Scalar helpers: whitespace, boilerplate filters, URL ops, language ID.

Reference anchors: trim (/root/reference/utils-common.go:31-34), textFilter
(/root/reference/utils-extractor.go:112-133 + internal/re2go), duplicate
test (/root/reference/utils-extractor.go:136-149), image checks
(/root/reference/utils-common.go:54-74), URL helpers
(/root/reference/url.go:31-120), language classifier
(/root/reference/utils-extractor.go:96-109 — whatlanggo; re-specified here
as a deterministic stopword-frequency classifier).
"""

from __future__ import annotations

import mimetypes
import posixpath
import re
from urllib.parse import urlparse, urljoin

from . import etree
from .etree import Element


def trim(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip, matching
    Go strings.Join(strings.Fields(s), " ") (utils-common.go:31). Soft
    hyphens are kept: the reference never strips them and its comparison
    expectations (scripts/comparison/data.go) contain 47 of them."""
    if not s:
        return ""
    return " ".join(s.split())


def str_word_count(s: str) -> int:
    return len(s.split())


def str_or(*args: str) -> str:
    for a in args:
        if a != "":
            return a
    return ""


# re2go/utils-extractor.re:4-31 — RE_FILTER (share-button boilerplate)
RE_FILTER = re.compile(
    r"(?i)\W*(Drucken|E-?Mail|Facebook|Flipboard|Google|Instagram|"
    r"Linkedin|Mail|PDF|Pinterest|Pocket|Print|QQ|Reddit|Twitter|"
    r"WeChat|WeiBo|Whatsapp|Xing|Mehr zum Thema:?|More on this\.{0,8})$"
)


def text_chars_test(s: str) -> bool:
    """True if the string has any non-space content."""
    return trim(s) != ""


# Cheap lowercase keyword screen that must hit before the (expensive)
# anchored regex can possibly match.
_FILTER_KEYWORDS = (
    "drucken", "mail", "facebook", "flipboard", "google", "instagram",
    "linkedin", "pdf", "pinterest", "pocket", "print", "qq", "reddit",
    "twitter", "wechat", "weibo", "whatsapp", "xing", "mehr zum thema",
    "more on this",
)


def text_filter(el: Element) -> bool:
    """True → drop the node (boilerplate or blank).
    Reference: utils-extractor.go:112-127."""
    text = el.text
    test_text = text if text != "" else el.tail
    if not text_chars_test(test_text):
        return True
    lowered = test_text.lower()
    if not any(k in lowered for k in _FILTER_KEYWORDS):
        return False
    return any(RE_FILTER.search(line) for line in test_text.split("\n"))


def duplicate_test(el: Element, cache, options) -> bool:
    """LRU segment dedup (utils-extractor.go:136-149): a segment longer
    than MinDuplicateCheckSize runes becomes a duplicate once seen more
    than MaxDuplicateCount times."""
    is_dup = False
    test_string = trim(etree.iter_text(el, " "))
    if len(test_string) > options.config.min_duplicate_check_size:
        val = cache.get(test_string)
        if val > options.config.max_duplicate_count:
            is_dup = True
        cache.put(test_string, val + 1)
    return is_dup


def is_image_file(image_src: str) -> bool:
    if not image_src:
        return False
    # strip query/fragment like Go's filepath.Ext on a URL path would not,
    # but mime.TypeByExtension sees the raw extension — match that.
    ext = posixpath.splitext(image_src)[1]
    mime = mimetypes.guess_type("x" + ext)[0] or ""
    return mime.startswith("image")


def is_image_element(el: Element) -> bool:
    for key, val in el.attrib.items():
        if key == "src" or key.startswith("data-src"):
            if is_image_file(val):
                return True
    return False


def uniquify_lists(*currents: str) -> list[str]:
    """Order-preserving distinct over split category/tag strings.
    Reference: utils-common.go:76-99."""
    final: list[str] = []
    seen: set[str] = set()
    for current in currents:
        separator = ";" if current.count(";") > current.count(",") else ","
        for entry in current.split(separator):
            entry = trim(entry).replace('"', "").replace("'", "")
            if entry and entry not in seen:
                final.append(entry)
                seen.add(entry)
    return final


# ---------------------------------------------------------------------------
# URL helpers (url.go:31-120)
# ---------------------------------------------------------------------------

def is_absolute_url(url: str) -> tuple:
    """url.go:31-44 — http(s) only; invalid ports reject the URL (Go's
    ParseRequestURI errors on them; Python defers until .port)."""
    try:
        parsed = urlparse(url)
        parsed.port  # raises ValueError on non-numeric/out-of-range port
    except ValueError:
        return False, None
    if parsed.scheme not in ("http", "https") or not parsed.netloc:
        return False, parsed
    return True, parsed


def create_absolute_url(url: str, base) -> str:
    """Resolve url against base; hash/data:/javascript: pass through.
    base may be a string or a ParseResult-ish or None."""
    if not url:
        return url
    if url.startswith(("#", "data:", "javascript:", "mailto:")):
        return url
    if base is None:
        return url
    base_str = base if isinstance(base, str) else base.geturl()
    try:
        return urljoin(base_str, url)
    except ValueError:
        return url


def get_base_url(url: str) -> str:
    try:
        p = urlparse(url)
        if not p.scheme or not p.netloc:
            return ""
        return f"{p.scheme}://{p.netloc}"
    except ValueError:
        return ""


def get_domain_url(url: str) -> str:
    """url.go:88-95 — the full hostname of an absolute URL."""
    ok, parsed = is_absolute_url(url)
    if not ok:
        return ""
    return parsed.hostname or ""


def validate_url(url: str, base=None) -> tuple[str, bool]:
    """url.go:106-120 — absolute URLs pass through; relative URLs are
    resolved against base (the original url) when possible."""
    ok, _ = is_absolute_url(url)
    if ok:
        return url, True
    new_url = create_absolute_url(url, base)
    ok, _ = is_absolute_url(new_url)
    if ok:
        return new_url, True
    return url, False


# ---------------------------------------------------------------------------
# Deterministic language classifier
# ---------------------------------------------------------------------------
# The reference delegates to whatlanggo (trigram profiles). A full trigram
# port is out of scope; this is a deterministic stopword-frequency
# classifier over the same ISO 639-1 surface, adequate for gating and for
# filling metadata.language on clearly monolingual text.

_STOPWORDS = {
    "en": "the and of to in is that it for was with as his on are this be at by have from or had not but what all were when there can will would she her him they my one do you said which their".split(),
    "de": "der die und das ist nicht von mit den des dem ein eine einen im für auf als auch sich werden wurde bei aus nach wie zum haben wird sind oder einer einem über aber wenn noch nur schon mehr kann muss sehr durch gegen ohne unter zwischen ihre seinem ihren dieser diese dieses man wir ich es dass sie er zu".split(),
    "fr": "le la les des une est dans pour que qui sur avec pas plus par mais comme tout nous vous ont cette aux être sont et du de il elle au ce se ne son sa ses leur bien sans peut fait deux après avant aussi même où donc entre".split(),
    "es": "el la los las una es en que de por para con se su al lo como más pero sus fue este son entre cuando y un del ya o ha sin sobre también hasta hay donde quien desde nos durante todos uno les ni contra ese eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él tanto esa estos mucho quienes nada muchos cual poco ella estar estas algunas algo nosotros".split(),
    "it": "il la che di e per una sono con non del alla nel più anche come dei delle questo essere dalla gli lo un in da si al ma le se nella della i o ha mi ci è sua suo".split(),
    "pt": "o a os as um uma é de em que para com não por mais como mas foi ele isso ou sua seu são do da no na se ao dos às pelo pela até isso ela entre depois sem mesmo aos seus quem nas me esse eles você essa num nem suas meu às minha numa pelos elas qual nós lhe deles essas esses pelas este dele".split(),
    "nl": "de het een en van in is dat op te zijn voor met als aan er maar om ook bij naar dan nog wordt wel geen al naar uit door over ze zich hij".split(),
    "ru": "и в не на что с он как это по но они из его за от так же для мы бы была было у а то все она к её их кто этот".split(),
    "id": "yang dan di ini itu dengan untuk dari dalam tidak pada adalah akan ke juga saya kita mereka bisa ada atau oleh sudah telah harus bahwa karena jika seperti saat tersebut".split(),
    "tr": "bir ve bu da ne için ile olarak daha çok ama gibi sonra kadar var yok ben sen biz onlar de mi en o ki".split(),
    "pl": "i w nie na to z że się jest do jak po przez tak ale za od czy tym jego która które który być już był może".split(),
    "sv": "och det att i en som på är av för med den till inte har de om ett han var men vi så kan man när år".split(),
}
# Character-level signals for short texts (stand-in for whatlanggo's
# trigram statistics): language-distinctive letters/punctuation.
_CHAR_SIGNALS = (
    ("es", "ñ¿¡"),
    ("de", "ß"),
    ("fr", "œàêçè"),
    ("pt", "ãõ"),
    ("pl", "łżśćą"),
    ("tr", "ğışİ"),
    ("ru", "бгджзйлпфцчшщыэюя"),
)

_STOPWORD_SETS = {lang: frozenset(words) for lang, words in _STOPWORDS.items()}


def detect_language(text: str) -> str:
    """Return ISO 639-1 code of the dominant language, or "" if unknown."""
    words = re.findall(r"[^\W\d_]+", text.lower())
    if len(words) < 3:
        return ""
    from collections import Counter

    counts = Counter(words)
    scores = {}
    for lang, sw in _STOPWORD_SETS.items():
        hits = sum(counts[w] for w in sw if w in counts)
        if hits:
            scores[lang] = hits
    # Distinctive-character fallback for short/ambiguous text
    lowered = text.lower()
    for lang, chars in _CHAR_SIGNALS:
        bonus = sum(lowered.count(c) for c in chars)
        if bonus:
            scores[lang] = scores.get(lang, 0) + bonus
    if not scores:
        return ""
    best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    if best[1] < max(2, len(words) // 50):
        return ""
    return best[0]


def language_classifier(content_text: str, comments_text: str) -> str:
    """utils-extractor.go:96-109 — classify the longer of the two texts
    with the trigram detector (whatlanggo shape: a best guess for any
    real text, not just stopword hits)."""
    from .lang import detect

    lang_test = comments_text if len(comments_text) > len(content_text) else content_text
    return detect(lang_test)


_RX_HTML_LANG = re.compile(r"(?i)[a-z]{2}")


def check_html_language(doc: Element, options, strict: bool) -> bool:
    """utils-extractor.go:44-93 — meta content-language / og:locale, then
    (strict) <html lang>."""
    from . import css

    html_node = doc if doc.tag == "html" else None
    if html_node is None:
        nodes = etree.get_elements_by_tag(doc, "html")
        if nodes:
            html_node = nodes[0]

    target = options.target_language
    for selector in (
        'meta[http-equiv="content-language"][content]',
        'meta[property="og:locale"][content]',
    ):
        meta_nodes = css.query_all(doc, selector)
        if not meta_nodes:
            continue
        for meta in meta_nodes:
            content = meta.get("content")
            for lang in _RX_HTML_LANG.findall(content):
                if lang.lower() == target:
                    return True
        return False

    if strict and html_node is not None and "lang" in html_node.attrib:
        for lang in _RX_HTML_LANG.findall(html_node.get("lang")):
            if lang.lower() == target:
                return True
        return False

    return True
