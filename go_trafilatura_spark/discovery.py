"""URL discovery from fetched feed/sitemap payloads (offline parsing).

The reference's feed/sitemap subcommands (cmd/go-trafilatura/feed.go:292-381,
sitemap.go) download then parse RSS/Atom feeds and XML sitemaps into URL
lists. Networking is out of scope here; the *parsing* is implemented as
pure functions plus DataFrame wrappers, so a table of fetched payloads
(url, body) explodes into a frontier of page URLs — the ingestion fan-out
stage of a crawl pipeline.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as xml_etree

from . import css, etree
from .utils import create_absolute_url, is_absolute_url

FEED_CONTENT_TYPES = frozenset((
    "application/atom+xml", "application/json", "application/rss+xml",
    "application/x.atom+xml", "application/x-atom+xml", "text/atom+xml",
    "text/plain", "text/rss+xml", "text/xml",
))

_RX_LOCALNAME = re.compile(r"\{.*\}")


def _local(tag: str) -> str:
    return _RX_LOCALNAME.sub("", tag)


def parse_feed(payload: bytes | str) -> list[str]:
    """RSS <item><link>text</link> and Atom <entry><link href=…/> URLs,
    absolute-only, order-preserving unique (feed.go:292-348)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", "replace")
    try:
        root = xml_etree.fromstring(payload)
    except xml_etree.ParseError:
        return []

    urls: list[str] = []
    for el in root.iter():
        name = _local(el.tag)
        if name == "item":  # RSS
            for link in el:
                if _local(link.tag) == "link":
                    href = (link.text or "").strip()
                    if is_absolute_url(href)[0]:
                        urls.append(href)
                        break
        elif name == "entry":  # Atom
            for link in el:
                if _local(link.tag) == "link":
                    href = link.get("href", "")
                    if href and is_absolute_url(href)[0]:
                        urls.append(href)
                        break

    seen: set[str] = set()
    out = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def find_feed_url_in_html(payload: bytes | str, base_url: str | None) -> str:
    """<link>/<a rel=alternate type=feed> discovery (feed.go:350-375)."""
    doc = etree.parse_html(payload)
    for node in css.query_all(doc, "link, a"):
        if node.get("rel") != "alternate":
            continue
        href = node.get("href")
        if not href:
            continue
        if node.get("type") in FEED_CONTENT_TYPES:
            return create_absolute_url(href, base_url)
    return ""


def parse_sitemap(payload: bytes | str) -> tuple[list[str], list[str]]:
    """Sitemap XML → (page urls, nested sitemap urls). Handles both
    urlset and sitemapindex documents (sitemap.go)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", "replace")
    try:
        root = xml_etree.fromstring(payload)
    except xml_etree.ParseError:
        return [], []

    pages: list[str] = []
    sitemaps: list[str] = []
    root_name = _local(root.tag)
    for el in root.iter():
        name = _local(el.tag)
        if name != "loc":
            continue
        loc = (el.text or "").strip()
        if not is_absolute_url(loc)[0]:
            continue
        parent_kind = root_name  # urlset → pages, sitemapindex → sitemaps
        if parent_kind == "sitemapindex":
            sitemaps.append(loc)
        else:
            pages.append(loc)
    return pages, sitemaps


# ---------------------------------------------------------------------------
# DataFrame wrappers: payload table → URL frontier
# ---------------------------------------------------------------------------

def discover_urls(df, kind: str = "feed"):
    """(source_url, body binary) → exploded (source_url, page_url) via a
    vectorized Arrow kernel; kind is 'feed' or 'sitemap'."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([
        StructField("source_url", StringType()),
        StructField("page_url", StringType()),
    ])

    def batches(it):
        import pandas as pd

        for pdf in it:
            src_out, url_out = [], []
            for src, body in zip(pdf["source_url"], pdf["body"]):
                if body is None:
                    continue
                if kind == "feed":
                    found = parse_feed(bytes(body))
                else:
                    found, _nested = parse_sitemap(bytes(body))
                for u in found:
                    src_out.append(src)
                    url_out.append(u)
            yield pd.DataFrame({"source_url": src_out, "page_url": url_out})

    return df.select("source_url", "body").mapInPandas(batches, schema)
