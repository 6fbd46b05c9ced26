"""Minimal CSS selector engine over the etree model.

Supports the selector subset the extraction cascade needs (the reference
uses cascadia for the same subset, e.g. /root/reference/baseline.go:13-20,
/root/reference/html-processing.go:489,544):

- selector groups: ``a, b``
- descendant combinator: ``div a``
- compound simple selectors: ``tag``, ``*``, ``#id``, ``.class``,
  ``[attr]``, ``[attr=v]``, ``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]``,
  ``[attr~=v]`` with optional quotes around v.

Matching is done over element attributes; class matching uses the
whitespace-separated class list for ``.class`` and substring semantics
for ``[class*=...]`` (same as real CSS).
"""

from __future__ import annotations

import re

from .etree import Element, get_elements_by_tag

_TOKEN = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)
    | \#(?P<id>[\w-]+)
    | \.(?P<class>[\w-]+)
    | \[(?P<attr>[\w-]+)(?:(?P<op>[\^\$\*~|]?=)(?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
    """,
    re.VERBOSE,
)


class SimpleSelector:
    __slots__ = ("tag", "conds")

    def __init__(self) -> None:
        self.tag: str | None = None
        self.conds: list[tuple[str, str, str]] = []  # (attr, op, value)

    def matches(self, el: Element) -> bool:
        if self.tag is not None and self.tag != "*" and el.tag != self.tag:
            return False
        if not self.conds:
            return True
        for attr, op, val in self.conds:
            actual = el.attrib.get(attr)
            if actual is None:
                return False
            if op == "":
                continue
            if op == "=":
                if actual != val:
                    return False
            elif op == "^=":
                if not actual.startswith(val):
                    return False
            elif op == "$=":
                if not actual.endswith(val):
                    return False
            elif op == "*=":
                if val not in actual:
                    return False
            elif op == "~=":
                if val not in actual.split():
                    return False
            else:
                return False
        return True


class CompoundSelector:
    """A chain of simple selectors joined by descendant combinators.
    The last/ancestor split is precomputed — matches() runs millions of
    times per batch and a per-call slice allocation dominates it."""

    __slots__ = ("parts", "_last", "_ancestors")

    def __init__(self, parts: list[SimpleSelector]):
        self.parts = parts
        self._last = parts[-1] if parts else None
        self._ancestors = parts[:-1]

    def matches(self, el: Element) -> bool:
        if self._last is None or not self._last.matches(el):
            return False
        remaining = self._ancestors
        idx = len(remaining) - 1
        if idx < 0:
            return True
        node = el.parent
        while idx >= 0 and node is not None:
            if remaining[idx].matches(node):
                idx -= 1
            node = node.parent
        return idx < 0


def _parse_simple(token: str) -> SimpleSelector:
    sel = SimpleSelector()
    pos = 0
    while pos < len(token):
        m = _TOKEN.match(token, pos)
        if m is None:
            raise ValueError(f"bad selector: {token!r}")
        if m.group("tag"):
            sel.tag = m.group("tag").lower()
        elif m.group("id"):
            sel.conds.append(("id", "=", m.group("id")))
        elif m.group("class"):
            sel.conds.append(("class", "~=", m.group("class")))
        elif m.group("attr"):
            op = m.group("op") or ""
            val = m.group("val") or ""
            sel.conds.append((m.group("attr").lower(), op, val))
        pos = m.end()
    return sel


def _split_outside_brackets(s: str, sep_ws: bool) -> list[str]:
    """Split on commas (sep_ws=False) or whitespace (sep_ws=True), but
    never inside [...] or quotes."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote = ""
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = ""
            continue
        if ch in "\"'":
            quote = ch
            buf.append(ch)
            continue
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        if depth == 0 and ((sep_ws and ch.isspace()) or (not sep_ws and ch == ",")):
            if buf:
                parts.append("".join(buf))
                buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


import functools


@functools.lru_cache(maxsize=256)
def _parse_group_cached(selector: str) -> tuple:
    return tuple(_parse_group_uncached(selector))


def parse_group(selector: str) -> list[CompoundSelector]:
    return list(_parse_group_cached(selector))


def _parse_group_uncached(selector: str) -> list[CompoundSelector]:
    group: list[CompoundSelector] = []
    for part in _split_outside_brackets(selector, sep_ws=False):
        part = part.strip()
        if not part:
            continue
        simples = [_parse_simple(tok) for tok in _split_outside_brackets(part, sep_ws=True)]
        group.append(CompoundSelector(simples))
    return group


def _candidates(root: Element, sels: list[CompoundSelector],
                index=None) -> list[Element]:
    """Traversal pre-filter: when every selector in the group targets
    the same final tag, walk only those elements (doc order preserved)
    instead of the whole tree — most metadata selectors are shaped
    'meta[...]' and this cuts the scan by ~100×. An ``index``
    (selectors.TagIndex built on this root) replaces the walk with a
    prebuilt doc-order lookup."""
    tags = {s._last.tag if s._last is not None else None for s in sels}
    if len(tags) == 1:
        tag = tags.pop()
        if tag is not None and tag != "*":
            if index is not None:
                return index.of_tag(tag)
            return get_elements_by_tag(root, tag)
    if index is not None:
        return index.elements
    return get_elements_by_tag(root, "*")


def query_all(root: Element, selector: str | list[CompoundSelector],
              index=None) -> list[Element]:
    """dom.QuerySelectorAll — all matching descendants in doc order.
    ``index`` must have been built on ``root`` itself (not a subtree)."""
    sels = parse_group(selector) if isinstance(selector, str) else selector
    out = []
    for el in _candidates(root, sels, index):
        for sel in sels:
            if sel.matches(el):
                out.append(el)
                break
    return out


def query(root: Element, selector: str | list[CompoundSelector],
          index=None) -> Element | None:
    """dom.QuerySelector — first matching descendant in doc order.
    ``index`` must have been built on ``root`` itself (not a subtree)."""
    sels = parse_group(selector) if isinstance(selector, str) else selector
    for el in _candidates(root, sels, index):
        for sel in sels:
            if sel.matches(el):
                return el
    return None
