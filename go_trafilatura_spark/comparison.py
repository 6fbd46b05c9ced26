"""The reference's comparison benchmark (926 curated real-world pages)
as one Spark job.

Parses the curated expectations table (scripts/comparison/data.go, read
directly from the read-only reference checkout), loads the page files,
runs the extraction kernel, and scores substring markers with JVM-side
array expressions — the Spark-first re-expression of
scripts/comparison/content.go:106-413 (same tp/fp/fn/tn and F-score
formulas, same Options: comments excluded, tables included, balanced).
"""

from __future__ import annotations

import os
import re

REFERENCE = "/root/reference"
DATA_GO = os.path.join(REFERENCE, "scripts", "comparison", "data.go")
COMPARISON_DIR = os.path.join(REFERENCE, "test-files", "comparison")
MOCK_DIR = os.path.join(REFERENCE, "test-files", "mock")

_GO_ESCAPES = {
    '"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r", "'": "'",
}


def _parse_go_string(src: str, i: int) -> tuple[str, int]:
    """Parse a Go interpreted string literal starting at src[i] == '"'."""
    assert src[i] == '"'
    out = []
    i += 1
    while i < len(src):
        ch = src[i]
        if ch == "\\":
            nxt = src[i + 1]
            if nxt == "u":
                out.append(chr(int(src[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "x":
                out.append(chr(int(src[i + 2 : i + 4], 16)))
                i += 4
                continue
            out.append(_GO_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if ch == '"':
            return "".join(out), i + 1
        out.append(ch)
        i += 1
    raise ValueError("unterminated string")


def _parse_string_list(src: str, i: int) -> tuple[list[str], int]:
    """Parse []string{...} starting right after the '{'."""
    out = []
    while i < len(src):
        ch = src[i]
        if ch == '"':
            s, i = _parse_go_string(src, i)
            out.append(s)
        elif ch == "}":
            return out, i + 1
        else:
            i += 1
    raise ValueError("unterminated list")


def load_comparison_entries() -> list[dict]:
    """Parse comparisonData (scripts/comparison/data.go:19+) into
    [{url, file, with, without}]."""
    with open(DATA_GO, encoding="utf-8") as f:
        src = f.read()

    start = src.index("var comparisonData")
    entries = []
    i = src.index("{", start) + 1
    n = len(src)
    while i < n:
        # Find the next entry key (a string literal followed by ':')
        while i < n and src[i] not in '"}':
            i += 1
        if i >= n or src[i] == "}":
            break
        url, i = _parse_go_string(src, i)
        # Skip to the entry struct body
        i = src.index("{", i) + 1
        entry = {"url": url, "file": "", "with": [], "without": [],
                 "title": "", "date": "", "authors": []}
        depth = 1
        while i < n and depth > 0:
            m = re.match(r"\s*(File|Title|Date|Sitename|Description|License|Region|Authors|With|Without|Comments|Categories|Tags)\s*:", src[i:])
            if m:
                field = m.group(1)
                i += m.end()
                # value is either a string or []string{...}
                while src[i] not in '"[':
                    i += 1
                if src[i] == '"':
                    val, i = _parse_go_string(src, i)
                    if field == "File":
                        entry["file"] = val
                    elif field == "Title":
                        entry["title"] = val
                    elif field == "Date":
                        entry["date"] = val
                else:
                    i = src.index("{", i) + 1
                    vals, i = _parse_string_list(src, i)
                    if field == "With":
                        entry["with"] = vals
                    elif field == "Without":
                        entry["without"] = vals
                    elif field == "Authors":
                        entry["authors"] = vals
                continue
            ch = src[i]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
            elif ch == '"':
                _, i = _parse_go_string(src, i)
                continue
            i += 1
        if entry["file"]:
            entries.append(entry)
    return entries


def resolve_file(name: str) -> str | None:
    for d in (COMPARISON_DIR, MOCK_DIR):
        path = os.path.join(d, name)
        if os.path.exists(path):
            return path
    return None


def build_dataframe(spark, entries: list[dict]):
    """(url, html, with, without, exp_*) rows for resolvable entries."""
    rows = []
    for e in entries:
        path = resolve_file(e["file"])
        if path is None:
            continue
        with open(path, "rb") as f:
            rows.append((e["url"], bytearray(f.read()), e["with"], e["without"],
                         e["title"], e["date"], "; ".join(e["authors"])))
    return spark.createDataFrame(
        rows,
        "url string, html binary, with array<string>, without array<string>, "
        "exp_title string, exp_date string, exp_authors string",
    )


def score(spark, enable_fallback: bool = False, focus: int = 0,
          entries: list[dict] | None = None):
    """Run the comparison benchmark; returns the metrics row
    (tp/fp/fn/tn/precision/recall/accuracy/f_score/docs/errors)."""
    from pyspark.sql import functions as F

    from .pipeline import extract_pages

    entries = entries or load_comparison_entries()
    df = build_dataframe(spark, entries)
    expectations = df.select("url", "with", "without")

    extracted = extract_pages(
        df.select("url", "html"),
        options={
            "exclude_comments": True,
            "exclude_tables": False,
            "enable_fallback": enable_fallback,
            "focus": focus,
        },
        num_partitions=64,
    )

    joined = extracted.join(F.broadcast(expectations), "url", "inner")
    # scripts/comparison/content.go:345-383 — errors contribute nothing;
    # empty text → all With are FN, all Without are TN.
    ok = joined.where(F.col("reject_reason").isNull())
    text = F.coalesce(F.col("content_text"), F.lit(""))
    scored = ok.select(
        F.expr("size(filter(with, w -> contains(content_text, w)))").alias("tp"),
        F.expr("size(filter(with, w -> NOT contains(content_text, w)))").alias("fn"),
        F.expr("size(filter(without, w -> contains(content_text, w)))").alias("fp"),
        F.expr("size(filter(without, w -> NOT contains(content_text, w)))").alias("tn"),
    )
    agg = scored.agg(
        F.sum("tp").alias("tp"), F.sum("fn").alias("fn"),
        F.sum("fp").alias("fp"), F.sum("tn").alias("tn"),
        F.count("*").alias("docs"),
    ).collect()[0]

    tp, fn, fp, tn = (float(agg[k]) for k in ("tp", "fn", "fp", "tn"))
    n_err = joined.where(F.col("reject_reason").isNotNull()).count()
    return {
        "tp": int(tp), "fn": int(fn), "fp": int(fp), "tn": int(tn),
        "docs": agg["docs"], "errors": n_err,
        "precision": tp / (tp + fp) if tp + fp else 0.0,
        "recall": tp / (tp + fn) if tp + fn else 0.0,
        "accuracy": (tp + tn) / (tp + tn + fp + fn) if tp + tn + fp + fn else 0.0,
        "f_score": (2 * tp) / (2 * tp + fp + fn) if tp else 0.0,
    }


def score_metadata(spark, entries: list[dict] | None = None):
    """Metadata accuracy over the comparison corpus: exact-match rates
    for title/date/authors on the entries that carry expectations."""
    from pyspark.sql import functions as F

    from .pipeline import extract_pages

    entries = entries or load_comparison_entries()
    df = build_dataframe(spark, entries)
    extracted = extract_pages(
        df.select("url", "html"),
        # Extensive date mode: the curated corpus dates carry
        # whole-document-scan semantics (go-htmldate Extensive, which
        # the reference selects whenever fallback is on).
        options={"exclude_comments": True, "date_mode": "extensive"},
        num_partitions=64,
    )
    joined = extracted.join(
        F.broadcast(df.select("url", "exp_title", "exp_date", "exp_authors")), "url"
    )
    agg = joined.agg(
        F.sum((F.col("exp_title") != "").cast("int")).alias("n_title"),
        F.sum(((F.col("exp_title") != "") & (F.col("title") == F.col("exp_title"))).cast("int")).alias("title_ok"),
        F.sum((F.col("exp_date") != "").cast("int")).alias("n_date"),
        F.sum(((F.col("exp_date") != "") & (F.col("date") == F.col("exp_date"))).cast("int")).alias("date_ok"),
        F.sum((F.col("exp_authors") != "").cast("int")).alias("n_authors"),
        F.sum(((F.col("exp_authors") != "") & (F.col("author") == F.col("exp_authors"))).cast("int")).alias("authors_ok"),
    ).collect()[0]
    out = {}
    for k in ("title", "date", "authors"):
        n = agg[f"n_{k}"]
        ok = agg[f"{k}_ok"]
        out[k] = {"n": int(n), "exact": int(ok), "rate": round(ok / n, 4) if n else None}
    return out


if __name__ == "__main__":
    import json
    import sys
    import time

    from .pipeline import build_session

    spark = build_session(master="local[32]", shuffle_partitions=64)
    results = {}
    configs = [
        ("balanced", False, 0),
        ("fallback", True, 0),
        ("precision", True, 2),
        ("recall", True, 1),
    ]
    only = set(sys.argv[1:])
    entries = load_comparison_entries()
    print(f"loaded {len(entries)} comparison entries", file=sys.stderr)
    for name, fb, focus in configs:
        if only and name not in only:
            continue
        t0 = time.time()
        res = score(spark, enable_fallback=fb, focus=focus, entries=entries)
        res["sec"] = round(time.time() - t0, 2)
        results[name] = res
        print(name, json.dumps(res), file=sys.stderr)
    if not only or "metadata" in only:
        results["metadata"] = score_metadata(spark, entries)
        print("metadata", json.dumps(results["metadata"]), file=sys.stderr)
    print(json.dumps(results))
    spark.stop()
