"""Tag catalogs and cleaning lists.

Transcribed semantics from /root/reference/settings.go:24-116 and
/root/reference/tag-converter.go:3-13 — these lists are the contract of
which elements survive extraction.
"""

from __future__ import annotations

# settings.go:24-35
TAGS_TO_CLEAN = frozenset(
    (
        "aside embed footer form head iframe menu object script "
        "applet audio canvas figure map picture svg video "
        "area blink button datalist dialog frame frameset fieldset "
        "link input ins label legend marquee math menuitem nav "
        "noscript optgroup option output param progress rp rt rtc "
        "select source style track textarea time use"
    ).split()
)

# settings.go:37-42
TAGS_TO_STRIP = frozenset(
    (
        "abbr acronym address bdi bdo big cite data dfn font "
        "hgroup img ins mark meta ruby small template "
        "tbody tfoot thead"
    ).split()
)

# settings.go:44-49
EMPTY_TAGS_TO_REMOVE = frozenset(
    (
        "article b blockquote dd div dt em "
        "h1 h2 h3 h4 h5 h6 i li main "
        "p pre q section span strong"
    ).split()
)

# settings.go:51-60
TAG_CATALOG = frozenset(
    (
        "blockquote code del s strike "
        "h1 h2 h3 h4 h5 h6 "
        "em i b strong u kbd samp tt var sub sup "
        "br hr ul ol dl p pre q details summary"
    ).split()
)

# settings.go:62-65
FORMAT_TAG_CATALOG = frozenset("em i b strong u kbd samp tt var sub sup".split())

# settings.go:67-77
VALID_TAG_CATALOG = frozenset(
    (
        "a abbr address area b base bdo blockquote body br button "
        "caption cite code col colgroup dd del dfn div dl dt em "
        "fieldset form h1 h2 h3 h4 h5 h6 head hr html i iframe "
        "img input ins kbd label legend li link map menu meta "
        "noscript object ol optgroup option p param pre q s samp "
        "script select small span strong style sub sup table tbody "
        "td textarea tfoot th thead title tr u ul var article "
        "aside audio canvas command datalist details embed figcaption "
        "figure footer header mark meter nav output progress rp rt "
        "ruby section source summary time track video wbr"
    ).split()
)

# settings.go:79
ELEMENT_WITH_SIZE_ATTR = frozenset("table th td hr pre".split())

# settings.go:82-116 (from go-domdistiller's allowlist)
ALLOWED_ATTRIBUTES = frozenset(
    (
        "abbr accept-charset accept accesskey action align alink "
        "allow allowfullscreen allowpaymentrequest alt archive as "
        "async autocapitalize autocomplete autocorrect autofocus "
        "autoplay autopictureinpicture axis background behavior "
        "bgcolor border bordercolor capture cellpadding cellspacing "
        "char challenge charoff charset checked cite class "
        "classid clear code codebase codetype color cols "
        "colspan compact content contenteditable controls "
        "controlslist conversiondestination coords crossorigin "
        "csp data datetime declare decoding default defer "
        "dir direction dirname disabled disablepictureinpicture "
        "disableremoteplayback disallowdocumentaccess download draggable "
        "elementtiming enctype end enterkeyhint event exportparts "
        "face for form formaction formenctype formmethod "
        "formnovalidate formtarget frame frameborder headers "
        "height hidden high href hreflang hreftranslate hspace "
        "http-equiv id imagesizes imagesrcset importance "
        "impressiondata impressionexpiry incremental inert inputmode "
        "integrity is ismap keytype kind invisible label lang "
        "language latencyhint leftmargin link list loading longdesc "
        "loop low lowsrc manifest marginheight marginwidth max "
        "maxlength mayscript media method min minlength multiple "
        "muted name nohref nomodule nonce noresize noshade "
        "novalidate nowrap object open optimum part pattern "
        "placeholder playsinline ping policy poster preload pseudo "
        "readonly referrerpolicy rel reportingorigin required resources "
        "rev reversed role rows rowspan rules sandbox scheme "
        "scope scrollamount scrolldelay scrolling select selected "
        "shadowroot shadowrootdelegatesfocus shape size sizes slot "
        "span spellcheck src srcset srcdoc srclang standby start "
        "step style summary tabindex target text title topmargin "
        "translate truespeed trusttoken type usemap valign value "
        "valuetype version vlink vspace virtualkeyboardpolicy "
        "webkitdirectory width wrap"
    ).split()
)

# tag-converter.go:3-13
LIST_TAGS = ("ul", "ol", "dl")
QUOTE_TAGS = ("blockquote", "pre", "q")
HEAD_TAGS = ("h1", "h2", "h3", "h4", "h5", "h6", "summary")
LB_TAGS = ("br", "hr", "lb")
HI_TAGS = ("em", "i", "b", "strong", "u", "kbd", "samp", "tt", "var", "sub", "sup", "mark")
REF_TAGS = ("a",)
GRAPHIC_TAGS = ("img",)
ITEM_TAGS = ("dd", "dt", "li")
CELL_TAGS = ("th", "td")

SET_LIST_TAGS = frozenset(LIST_TAGS)
SET_QUOTE_TAGS = frozenset(QUOTE_TAGS)
SET_HEAD_TAGS = frozenset(HEAD_TAGS)
SET_LB_TAGS = frozenset(LB_TAGS)
SET_HI_TAGS = frozenset(HI_TAGS)
SET_REF_TAGS = frozenset(REF_TAGS)
SET_GRAPHIC_TAGS = frozenset(GRAPHIC_TAGS)
SET_ITEM_TAGS = frozenset(ITEM_TAGS)
SET_CELL_TAGS = frozenset(CELL_TAGS)
