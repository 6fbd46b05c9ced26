"""Top-level extraction cascade: HTML bytes → (content, comments, metadata).

Transcribed semantics from /root/reference/core.go:71-219. This is the
pure per-document function executed for each row inside the Spark
kernel; it never touches Spark itself.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import css, etree, selectors
from .baseline import baseline
from .etree import Element
from .htmlprocessing import (
    convert_tags,
    doc_cleaning,
    post_cleaning,
    prune_unwanted_nodes,
)
from .lru import LRUCache
from .main_extractor import extract_comments, extract_content
from .metadata import Metadata, extract_metadata
from .options import FAVOR_PRECISION, Options
from .settings import FORMAT_TAG_CATALOG
from .utils import check_html_language, duplicate_test, language_classifier


class ExtractError(Exception):
    """Document rejected by one of the gates (core.go's error returns)."""

    def __init__(self, reason: str, detail: str = ""):
        super().__init__(f"{reason}: {detail}" if detail else reason)
        self.reason = reason


@dataclass
class ExtractResult:
    content_node: Element | None
    comments_node: Element | None
    content_text: str
    comments_text: str
    metadata: Metadata


def extract(html_input: bytes | str, options: Options | None = None) -> ExtractResult:
    """Extract — parse + run the document cascade (core.go:71-79)."""
    doc = etree.parse_html(html_input)
    return extract_document(
        doc, options or Options(), owns_doc=True,
        reparse=lambda: etree.parse_html(html_input),
    )


def extract_document(doc: Element, options: Options, owns_doc: bool = False,
                     reparse=None) -> ExtractResult:
    """ExtractDocument (core.go:82-219). ``owns_doc=True`` lets the
    cascade mutate the input tree instead of cloning it first (the
    reference always clones, core.go:133 — identical results, fewer
    allocations when the caller discards the tree).

    ``reparse`` (a zero-arg callable returning a fresh parse of the
    same input) replaces the eager pristine-tree clone the baseline
    rescue would otherwise need: the rescue fires only on pages whose
    extraction falls short of min_extracted_size, so re-parsing those
    few beats deep-cloning every page (the reference's docBackup2,
    core.go:135 — identical bytes either way)."""
    cache = LRUCache(options.config.cache_size)

    # Language gate (non-strict)
    if options.target_language and not check_html_language(doc, options, False):
        raise ExtractError("language_mismatch", options.target_language)

    # Metadata (on the uncleaned tree)
    metadata = extract_metadata(doc, options)

    if options.has_essential_metadata:
        if metadata.title == "":
            raise ExtractError("missing_title")
        if metadata.url == "":
            raise ExtractError("missing_url")
        if metadata.date == "":
            raise ExtractError("missing_date")

    # Backfill original URL from metadata
    if options.original_url is None and metadata.url != "":
        options.original_url = metadata.url

    # User-specified prune selector
    if options.prune_selector:
        try:
            sels = css.parse_group(options.prune_selector)
        except ValueError:
            sels = None
        if sels:
            # One rule matching the whole selector group (cascadia group match)
            group_rule = [lambda n, _ss=sels: any(s.matches(n) for s in _ss)]
            doc = prune_unwanted_nodes(doc, group_rule)

    # Clone working copies. The reference always makes three clones
    # (core.go:133-135); we skip the ones that cannot be consumed under
    # the current options — pure allocation savings, no semantic change.
    if not owns_doc:
        doc = etree.clone(doc, True)
    doc_backup1 = etree.clone(doc, True) if options.enable_fallback else None
    needs_baseline = (
        options.config.min_extracted_size > 0 and options.focus != FAVOR_PRECISION
    )
    doc_backup2 = (
        None if not needs_baseline
        else reparse if reparse is not None
        else etree.clone(doc, True)
    )

    # Clean and convert
    doc_cleaning(doc, options)
    convert_tags(doc, options)

    # Comments
    tmp_comments = ""
    len_comments = 0
    comments_body: Element | None = None
    shared_index = None
    if not options.exclude_comments:
        # One TagIndex serves both comment and content rule cascades:
        # extract_comments never mutates doc (prune works on a clone).
        shared_index = selectors.TagIndex(doc)
        comments_body, tmp_comments = extract_comments(
            doc, cache, options, index=shared_index)
        len_comments = len(tmp_comments)
    elif options.focus == FAVOR_PRECISION:
        # `doc` is our private working copy at this point — prune in place
        doc = prune_unwanted_nodes(doc, selectors.REMOVED_COMMENTS, in_place=True)

    # Content
    post_body, tmp_body_text = extract_content(doc, cache, options,
                                               index=shared_index)

    # Fallback comparison (external.go:50-101)
    if options.enable_fallback:
        from .external import compare_external_extraction

        post_body, tmp_body_text = compare_external_extraction(
            doc_backup1, post_body, tmp_body_text, options
        )

    # Baseline rescue
    len_text = len(tmp_body_text)
    if len_text < options.config.min_extracted_size and options.focus != FAVOR_PRECISION:
        if callable(doc_backup2):
            doc_backup2 = doc_backup2()  # deferred re-parse (see docstring)
        post_body, tmp_body_text = baseline(doc_backup2)

    # Tree size sanity check
    if options.max_tree_size > 0:
        if len(etree.children_of(post_body)) > options.max_tree_size:
            for tag in FORMAT_TAG_CATALOG:
                etree.strip_tags(post_body, tag)
            n_children = len(etree.children_of(post_body))
            if n_children > options.max_tree_size:
                raise ExtractError("tree_too_big", str(n_children))

    # Size gates
    len_text = len(tmp_body_text)
    if (
        len_text < options.config.min_output_size
        and len_comments < options.config.min_output_comment_size
    ):
        raise ExtractError("too_short", f"{len_text} {len_comments}")

    # Body-level duplicate gate
    if options.deduplicate and duplicate_test(post_body, cache, options):
        raise ExtractError("duplicate")

    # Language sanity (core.go:196-201: any classifier answer that is
    # not the target rejects — the round-2 stopword classifier only
    # gated on a positive detection; the trigram detector restores the
    # reference's exact condition)
    lang = language_classifier(tmp_body_text, tmp_comments)
    if options.target_language and lang != options.target_language:
        raise ExtractError("wrong_language", f"want {options.target_language} got {lang}")

    if lang != "":
        metadata.language = lang

    # Post cleaning
    post_cleaning(post_body)
    post_cleaning(comments_body)

    return ExtractResult(
        content_node=post_body,
        comments_node=comments_body,
        content_text=tmp_body_text,
        comments_text=tmp_comments,
        metadata=metadata,
    )
