"""C4-style text cleaning for training-data pipelines — pure Spark SQL.

The standard pre-training cleanup pass (cf. the C4 dataset's heuristics):
drop junk LINES inside each document (too short, no terminal punctuation,
boilerplate markers), drop repeated lines within a document, and redact
PII-looking spans.  Everything is whole-stage-codegen expressions — one
narrow projection per doc, zero Python, zero shuffles — so the pass
composes with validation/dedup in a single scan at any corpus size.

All regexes are kept RE2-compatible so an external engine (DuckDB
oracle) reproduces every transform byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Boilerplate markers: a line containing any of these (case-insensitive)
# is dropped — the C4 "javascript / cookie / terms of use" family.
DEFAULT_BOILERPLATE = ["javascript", "cookie", "terms of use", "privacy policy"]

# PII redaction patterns (RE2-safe, applied in order).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{13,19}\b", "<LONGNUM>"),
]


def redact_pii(col: Column) -> Column:
    """Replace PII-looking spans (emails, IPv4s, SSN-shaped, long digit
    runs) with typed placeholder tokens."""
    out = col
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def _line_ok(line: Column, *, min_line_chars: int,
             require_terminal_punct: bool,
             boilerplate: list[str]) -> Column:
    t = F.trim(line)
    ok = F.length(t) >= min_line_chars
    if require_terminal_punct:
        ok = ok & t.rlike(r"[.!?]$")
    low = F.lower(t)
    for marker in boilerplate:
        ok = ok & ~low.contains(marker.lower())
    return ok


def clean_lines(
    text: Column,
    *,
    min_line_chars: int = 10,
    require_terminal_punct: bool = False,
    boilerplate: list[str] | None = None,
    dedupe: bool = True,
) -> Column:
    """Cleaned text: junk lines dropped, (optionally) repeated lines
    deduped keeping first occurrence, lines re-joined with newline."""
    boilerplate = DEFAULT_BOILERPLATE if boilerplate is None else boilerplate
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    kept = F.filter(
        lines,
        lambda ln: _line_ok(
            ln, min_line_chars=min_line_chars,
            require_terminal_punct=require_terminal_punct,
            boilerplate=boilerplate,
        ),
    )
    if dedupe:
        kept = F.array_distinct(kept)  # keeps first-occurrence order
    return F.array_join(kept, "\n")


def clean_documents(
    df: DataFrame,
    text_col: str,
    *,
    min_line_chars: int = 10,
    require_terminal_punct: bool = False,
    boilerplate: list[str] | None = None,
    dedupe_lines: bool = True,
    redact: bool = True,
    out_col: str = "text_clean",
) -> DataFrame:
    """Cleaning pass over a documents table: adds ``out_col`` (cleaned,
    optionally PII-redacted text) plus audit columns n_lines / n_lines_kept
    — single narrow projection, no shuffle."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = clean_lines(
        F.col(text_col), min_line_chars=min_line_chars,
        require_terminal_punct=require_terminal_punct,
        boilerplate=boilerplate, dedupe=dedupe_lines,
    )
    if redact:
        cleaned = redact_pii(cleaned)
    n_kept = F.when(cleaned == "", F.lit(0)).otherwise(
        F.size(F.split(cleaned, "\n"))
    )
    return df.withColumns({
        out_col: cleaned,
        "n_lines": F.size(F.split(raw, "\n")),
        "n_lines_kept": n_kept,
    })
