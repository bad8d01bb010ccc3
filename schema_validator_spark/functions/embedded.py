"""Embedded natural-text extraction from source code: string literals
and comments, exploded as ``(id..., kind, text)`` rows — the NL channel
of a code corpus.  This is the input surface for running the TEXT
pipeline over code (language-ID of comments, PII sweep over literals,
docstring-grade quality scoring, NL decontamination) without treating
whole files as prose.

Extraction order is the type-2 normalization chain's (single source of
truth: clones.STRING_PATTERNS / codequality.COMMENT_SYNTAX): string
literals are extracted-and-masked FIRST, pattern by pattern, so a
``//`` inside a URL literal never spawns a comment and a triple-quoted
docstring is one fragment rather than an empty pair + body; comments
are then extracted from the masked residue, block comments before line
comments so a ``//`` inside ``/* ... */`` is not double-emitted.

Documented syntactic-tier trades (deterministic, same in the DuckDB
oracle): a quoted fragment inside a comment is emitted as a 'string'
row (strings mask first), and a string masked inside a comment leaves
the class token ``§`` in the emitted comment text.  Fragments keep
their delimiters (quotes / comment markers) — they are loss-free spans
of the original text, modulo the masking above.

Scale shape: the whole extraction is one codegen projection (chained
regexp_extract_all / regexp_replace + array HOFs) and ONE explode
riding the scan — zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.clones import S_TOK, STRING_PATTERNS
from ..operators.codequality import COMMENT_SYNTAX


def _fragments(content_col: str, lang_col: str, syn):
    """(strings, comments) array Columns — the shared extraction."""
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))

    strings = F.array().cast("array<string>")
    cur = s
    for pat in STRING_PATTERNS:
        strings = F.concat(
            strings, F.regexp_extract_all(cur, F.lit(pat), 0)
        )
        cur = F.regexp_replace(cur, pat, S_TOK)

    empty = F.array().cast("array<string>")
    chain = None
    for lg, (line_pat, blk_pat) in sorted(syn.items()):
        if blk_pat:
            arr = F.concat(
                F.regexp_extract_all(cur, F.lit(blk_pat), 0),
                F.regexp_extract_all(
                    F.regexp_replace(cur, blk_pat, ""),
                    F.lit(line_pat),
                    0,
                ),
            )
        else:
            arr = F.regexp_extract_all(cur, F.lit(line_pat), 0)
        cond = lang == lg
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    comments = chain.otherwise(empty) if chain is not None else empty
    return strings, comments


def embedded_text(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """``(id_cols..., kind, text)`` — one row per string literal
    (``kind = 'string'``) and per comment (``kind = 'comment'``),
    duplicates preserved.  Langs without a registered comment syntax
    still yield string rows."""
    if not id_cols:
        raise ValueError("embedded_text needs id columns")
    syn = syntax if syntax is not None else COMMENT_SYNTAX
    strings, comments = _fragments(content_col, lang_col, syn)

    tagged = F.concat(
        F.transform(
            strings,
            lambda x: F.struct(
                F.lit("string").alias("kind"), x.alias("text")
            ),
        ),
        F.transform(
            comments,
            lambda x: F.struct(
                F.lit("comment").alias("kind"), x.alias("text")
            ),
        ),
    )
    return df.select(
        *id_cols, F.explode(tagged).alias("_f")
    ).select(*id_cols, F.col("_f.kind").alias("kind"),
             F.col("_f.text").alias("text"))


def embedded_text_stats(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Per-file channel summary: ``(id_cols..., n_strings, n_comments,
    string_chars, comment_chars)`` — same extraction, no explode and
    NO shuffle (one projection; counts and char sums are array HOFs
    over the materialized fragment lists)."""
    if not id_cols:
        raise ValueError("embedded_text_stats needs id columns")
    syn = syntax if syntax is not None else COMMENT_SYNTAX
    strings, comments = _fragments(content_col, lang_col, syn)
    base = df.select(
        *id_cols, strings.alias("_s"), comments.alias("_c")
    )

    def chars(col):
        return F.aggregate(
            col, F.lit(0), lambda acc, x: acc + F.length(x)
        )

    return base.select(
        *id_cols,
        F.size("_s").alias("n_strings"),
        F.size("_c").alias("n_comments"),
        chars(F.col("_s")).alias("string_chars"),
        chars(F.col("_c")).alias("comment_chars"),
    )


def strip_comment_pattern(line_pat: str, blk_pat: str | None) -> str:
    """The single-pass strip regex for one lang: a leftmost-first
    alternation ``(?s)(strings)|(?:comments)`` — string branches
    CAPTURED (re-emitted via ``$1``/``\\1``), comment branches not.
    Single source of truth for the Spark transform AND the DuckDB
    oracle (the component patterns are clones.STRING_PATTERNS /
    codequality.COMMENT_SYNTAX, both already proven RE2-portable by
    the type-2 oracle)."""
    strs = "|".join(p.removeprefix("(?s)") for p in STRING_PATTERNS)
    if blk_pat:
        com = f"{blk_pat.removeprefix('(?s)')}|{line_pat}"
    else:
        com = line_pat
    return f"(?s)({strs})|(?:{com})"


def strip_comments(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    out_col: str = "content_stripped",
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """``(id_cols..., out_col, n_comment_chars)`` — the code-only
    training channel: comments removed, string literals and layout
    preserved byte-for-byte (the complement of ``embedded_text``'s
    comment rows; code LLMs are commonly trained on both the raw and
    the comment-stripped variant, and docstring-conditioned objectives
    need the stripped body).

    ONE regexp_replace per lang does the whole job: a leftmost-first
    alternation matches string literals (captured, re-emitted via
    ``$1`` — both Java regex and RE2 substitute the empty string for a
    non-participating group) and comments (dropped).  Leftmost scan IS
    the correct 2-token lexer: a ``//`` inside a URL literal is
    protected because the string opened first; a quote inside a
    comment is stripped because the comment opened first.  This
    deliberately differs from the extraction chain's global pattern
    priority (which masks ALL strings before looking at comments) —
    positional priority is the lexing order; the chain's trade is
    documented in the module docstring.  Known limit (shared with the
    whole syntactic tier): backslash-escaped quotes end a string
    early.

    Newlines are never removed (line comments match ``[^\\n]*``; block
    comments keep surrounding layout), so line numbers survive for
    diff/chunk alignment.  Langs without a registered comment syntax
    pass through unchanged with ``n_comment_chars = 0``; NULL content
    becomes ``''``.

    Scale shape: one codegen regexp_replace CASE riding the scan —
    zero shuffles, zero Python, zero joins."""
    if not id_cols:
        raise ValueError("strip_comments needs id columns")
    syn = syntax if syntax is not None else COMMENT_SYNTAX
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    chain = None
    for lg, (line_pat, blk_pat) in sorted(syn.items()):
        pat = strip_comment_pattern(line_pat, blk_pat)
        cond = lang == lg
        stripped = F.regexp_replace(s, pat, "$1")
        chain = (
            F.when(cond, stripped)
            if chain is None
            else chain.when(cond, stripped)
        )
    out = chain.otherwise(s) if chain is not None else s
    return df.select(
        *id_cols,
        out.alias(out_col),
        (F.length(s) - F.length(out)).alias("n_comment_chars"),
    )


def comment_lang_mix(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    lang_col: str,
    *,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Per-repo NATURAL-language mix of the comment channel:
    ``(repo, comment_lang, n_files, share)`` — which human language a
    repo's comments are written in (text.lang_id stopword tier over
    each file's comment blob; ``unknown`` rows are kept — short code
    comments often carry no stopwords).  The multilingual-curation
    signal: filter or rebalance a code corpus by comment language the
    way a text corpus is balanced by document language.  String
    literals are masked BEFORE comment extraction (the _fragments
    contract), so an English string constant cannot tint a
    Spanish-commented file.  Files with no comments are excluded;
    ``share`` is within-repo over comment-bearing files, 6dp.

    Scale shape: extraction is materialized ONCE as an explicit array
    column (the shared-derivation rule — a filter or repeated lambda
    reference would re-run the regex chain); the no-comment guard is a
    NULL verdict dropped only ABOVE the share window — a grouping-
    column filter placed right after the groupBy gets pushed below the
    Aggregate AND the Project, re-running the whole extraction chain a
    second time per input row (measured 2x at 32M rows; the window is
    the pushdown barrier, and the NULL group is excluded from the
    share denominator by a conditional sum instead).  ONE groupBy at
    (repo, lang) scale + the license_summary-style share window over
    repo-scale rows."""
    from pyspark.sql.window import Window

    from .text import lang_id

    syn = syntax if syntax is not None else COMMENT_SYNTAX
    _, comments = _fragments(content_col, lang_col, syn)
    base = df.select(
        F.col(repo_col).alias("repo"), comments.alias("_c")
    )
    verdict = base.select(
        "repo",
        F.when(
            F.size("_c") > 0, lang_id(F.array_join(F.col("_c"), "\n"))
        ).alias("comment_lang"),
    )
    counts = verdict.groupBy("repo", "comment_lang").agg(
        F.count(F.lit(1)).alias("n_files")
    )
    w = Window.partitionBy("repo")
    denom = F.sum(
        F.when(F.col("comment_lang").isNotNull(), F.col("n_files"))
    ).over(w)
    return counts.select(
        "repo",
        "comment_lang",
        "n_files",
        F.round(F.col("n_files") / denom, 6).alias("share"),
    ).filter(F.col("comment_lang").isNotNull())
