"""HTML -> text extraction — pure Spark SQL, zero Python.

The step *before* operators/clean.py's C4 line filters in a web
pipeline: raw crawled HTML must become plain text (tags stripped,
script/style/comment blocks dropped, block boundaries preserved as
newlines, common entities decoded, whitespace normalized) before any
line-level heuristic makes sense.  Real pipelines use a DOM parser
(trafilatura/jusText — not installable in this container and far too
slow per-row at 10^12 docs anyway); this is the regex tier those
pipelines fall back to at scale, expressed as a fixed ordered chain of
``regexp_replace``/``replace`` calls inside whole-stage codegen — one
narrow projection, zero shuffles, composing with validation/cleaning in
a single scan.

All regexes are RE2-safe (non-greedy dot, inline ``(?is)`` flags, ASCII
``\\b`` only) so the DuckDB oracle replays every edit byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered pipeline; ORDER MATTERS and the oracle replays it verbatim.
# 1. drop invisible blocks entirely (their text must not leak)
_BLOCK_STRIP: list[tuple[str, str]] = [
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<title\b[^>]*>.*?</title\s*>", " "),
]
# 2. block-level boundaries become newlines so line heuristics survive
_NEWLINE_TAGS: list[tuple[str, str]] = [
    (r"(?i)<(?:br|hr)\s*/?>", "\n"),
    (r"(?is)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article)\s*>", "\n"),
]
# 3. every remaining tag is inline noise
_ANY_TAG = r"(?s)<[^>]+>"
# 4. entity decode — literal replaces (no regex); &amp; LAST so
#    double-encoded text decodes one level per pass, the standard order
_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_to_text(col: Column) -> Column:
    """Plain text extracted from an HTML column (NULL-safe: NULL -> '').

    Whitespace contract: horizontal runs collapse to one space, spaces
    around newlines are absorbed, blank-line runs collapse to one
    newline, and the result is trimmed.
    """
    out = F.coalesce(col, F.lit(""))
    for pat, rep in _BLOCK_STRIP + _NEWLINE_TAGS:
        out = F.regexp_replace(out, pat, rep)
    out = F.regexp_replace(out, _ANY_TAG, " ")
    for lit, rep in _ENTITIES:
        out = F.replace(out, F.lit(lit), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t\r\f]+", " ")
    out = F.regexp_replace(out, r" *\n *", "\n")
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    # \s-anchored trim (F.trim drops spaces only, not newlines); RE2 and
    # Java agree on ASCII \s so the oracle replays it
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def pipeline_spec() -> list[tuple[str, str, str]]:
    """Ordered ``('re'|'lit', pattern, replacement)`` steps of
    :func:`html_to_text`, for external byte-exact replay (the DuckDB
    oracle builds its regexp_replace chain from this — single source of
    truth, like operators/pii.py over clean.PII_PATTERNS)."""
    steps: list[tuple[str, str, str]] = [
        ("re", p, r) for p, r in _BLOCK_STRIP + _NEWLINE_TAGS
    ]
    steps.append(("re", _ANY_TAG, " "))
    steps.extend(("lit", a, b) for a, b in _ENTITIES)
    steps.extend(
        [
            ("re", r"[ \t\r\f]+", " "),
            ("re", r" *\n *", "\n"),
            ("re", r"\n{2,}", "\n"),
            ("re", r"^\s+|\s+$", ""),
        ]
    )
    return steps


def html_title(col: Column) -> Column:
    """<title> contents (trimmed, whitespace-collapsed), '' if absent."""
    raw = F.regexp_extract(
        F.coalesce(col, F.lit("")), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1
    )
    return F.trim(F.regexp_replace(raw, r"\s+", " "))


def html_link_count(col: Column) -> Column:
    """Number of anchor tags carrying an href."""
    return F.regexp_count(
        F.coalesce(col, F.lit("")), F.lit(r"(?is)<a\b[^>]*\bhref\s*=")
    )
