"""Code complexity metrics over the north rule's (repo, path, commit,
lang, content) source-code table — the maintainability / model-quality
signal beside operators/codequality.py's hygiene gate.

Signals are the standard lexical proxies (a full parser is out of scope
and unnecessary at corpus grain):

- **decision points** — per-lang branch-keyword occurrences (``if``,
  ``for``, ``case``, …) plus short-circuit boolean operators
  (``&&``/``||`` for C-family, ``and``/``or`` words for Python), the
  classic cyclomatic-complexity estimate (McCabe 1976: complexity =
  decisions + 1; counting branch keywords lexically is the documented
  proxy every large-corpus study uses, e.g. Hindle et al. 2008).
- **max indent** — deepest leading-whitespace column over non-blank
  lines after tab expansion: the nesting-depth proxy (Hindle, Godfrey
  & Holt 2008, "Reading Beside the Lines": indentation tracks block
  nesting).

Reference analog: the tag-rule model (rule/str.go, rule/number.go)
validates scalar VALUES; this derives per-file structural metrics those
rules can then gate (e.g. ``max=`` on cyclomatic) — same engine, new
measurement layer.

Syntactic tier, documented: a keyword inside a string literal or
comment counts.  The trade is the same one functions/imports.py and
operators/codequality.comment_stats already make — regex-level
scanning, zero parsing, pure codegen.

Scale shape: every signal is a fixed expression chain riding the scan
— whole-stage codegen, zero shuffles, zero Python.  The per-line
indent list is one ``transform`` over one materialized split (heavy
derivations shared through explicit columns — lambda bodies don't CSE
with outer expressions, see CLAUDE.md).  ``complexity_by_lang`` adds
ONE map-side-combinable groupBy over the tiny lang vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns per tab stop when expanding leading tabs for the indent
#: measurement (single source of truth for the oracle)
TAB_WIDTH = 4

#: lang -> (branch keywords, count C-family ``&&``/``||`` operators?).
#: Keywords are matched whole-word (``\b`` both sides); Python's
#: ``and``/``or`` ARE its short-circuit operators so they sit in the
#: keyword list and the operator flag stays off.  Deliberately the
#: high-frequency core — a missed construct undercounts one branch, it
#: never corrupts the metric.  Unregistered langs get zero decisions
#: (cyclomatic 1), mirroring codequality.COMMENT_SYNTAX's contract.
DECISION_SYNTAX: dict[str, tuple[tuple[str, ...], bool]] = {
    "py": (
        ("if", "elif", "for", "while", "except", "and", "or", "case"),
        False,
    ),
    "go": (("if", "for", "case", "select"), True),
    "js": (("if", "for", "while", "case", "catch", "do"), True),
    "ts": (("if", "for", "while", "case", "catch", "do"), True),
    "java": (("if", "for", "while", "case", "catch", "do"), True),
    "c": (("if", "for", "while", "case"), True),
}


def decision_pattern(words: tuple[str, ...]) -> str:
    """RE2-safe whole-word alternation for one lang's branch keywords.
    Longest-first ordering so leftmost-FIRST engines (Java regex, RE2
    default) can never prefer a prefix alternative — the oracle builds
    its pattern through this same function."""
    ordered = sorted(words, key=lambda w: (-len(w), w))
    return r"\b(?:" + "|".join(ordered) + r")\b"


def complexity_stats(
    df: DataFrame,
    content_col: str,
    lang_col: str,
    *,
    keep_cols: list[str] | None = None,
    syntax: dict[str, tuple[tuple[str, ...], bool]] | None = None,
    tab_width: int = TAB_WIDTH,
) -> DataFrame:
    """Per-file structural metrics: ``(keep_cols..., n_lines,
    n_decisions, n_bool_ops, cyclomatic, max_indent,
    decision_density)``.

    ``cyclomatic = n_decisions + n_bool_ops + 1`` (McCabe proxy at
    file grain); ``decision_density`` is decisions per line rounded
    6dp (``n_lines >= 1`` always — splitting "" yields one empty
    line — so the density is never NULL); ``max_indent`` is the
    deepest leading-space column over non-blank lines after expanding
    tabs to ``tab_width`` columns (0 for empty / all-blank files).
    ``&&``/``||`` are counted by replace-length delta — pure codegen,
    no regex engine."""
    syn = syntax if syntax is not None else DECISION_SYNTAX
    if not syn:
        raise ValueError("empty decision syntax map")
    keep_cols = list(keep_cols or [])
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))

    def _ops():
        amp = F.length(s) - F.length(F.replace(s, F.lit("&&")))
        bar = F.length(s) - F.length(F.replace(s, F.lit("||")))
        return ((amp + bar) / 2).cast("int")

    chain = None
    for lg, (words, count_ops) in sorted(syn.items()):
        b = F.struct(
            F.regexp_count(s, F.lit(decision_pattern(words))).alias("kw"),
            (_ops() if count_ops else F.lit(0)).alias("op"),
        )
        cond = lang == lg
        chain = F.when(cond, b) if chain is None else chain.when(cond, b)
    zero = F.struct(F.lit(0).alias("kw"), F.lit(0).alias("op"))
    st = chain.otherwise(zero)

    # leading-whitespace columns per non-blank line; tabs expanded
    # first so mixed-indent files measure in columns, not characters
    expanded = F.replace(s, F.lit("\t"), F.lit(" " * tab_width))
    indents = F.transform(
        F.split(expanded, "\n", -1),
        lambda l: F.when(F.ltrim(l) == "", F.lit(0)).otherwise(
            F.length(l) - F.length(F.ltrim(l))
        ),
    )
    base = df.select(
        *keep_cols,
        F.size(F.split(s, "\n", -1)).alias("n_lines"),
        st.alias("_st"),
        F.array_max(indents).alias("max_indent"),
    )
    dec = F.col("_st.kw") + F.col("_st.op")
    return base.select(
        *keep_cols,
        "n_lines",
        F.col("_st.kw").alias("n_decisions"),
        F.col("_st.op").alias("n_bool_ops"),
        (dec + F.lit(1)).alias("cyclomatic"),
        "max_indent",
        F.round(dec / F.col("n_lines"), 6).alias("decision_density"),
    )


def indent_style(content_col: str):
    """String Column: the file's indentation style — ``tabs`` /
    ``spaces`` / ``mixed`` (both appear as a line's FIRST character) /
    ``none`` (no indented lines).  First-character classification
    only: an alignment space after a tab doesn't flip a tabs file to
    mixed (the style signal is what OPENS the indent)."""
    s = F.coalesce(F.col(content_col), F.lit(""))
    lines = F.split(s, "\n", -1)
    first = lambda l: F.substring(l, 1, 1)  # noqa: E731
    n_tab = F.size(F.filter(lines, lambda l: first(l) == "\t"))
    n_sp = F.size(F.filter(lines, lambda l: first(l) == " "))
    return (
        F.when((n_tab > 0) & (n_sp > 0), F.lit("mixed"))
        .when(n_tab > 0, F.lit("tabs"))
        .when(n_sp > 0, F.lit("spaces"))
        .otherwise(F.lit("none"))
    )


def indent_profile(
    df: DataFrame,
    content_col: str,
    lang_col: str,
) -> DataFrame:
    """Per-lang indentation-style mix ``(lang, n_files, tabs_share,
    spaces_share, mixed_share)`` (6dp) — the formatting-consistency
    audit (a lang whose files split between tabs and spaces diffs
    noisily and trains a model on both conventions).  One map-side-
    combinable groupBy over the lang vocabulary; the style
    classification rides the scan."""
    style = indent_style(content_col)
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    n = F.count(F.lit(1))
    return df.groupBy(lang.alias("lang")).agg(
        n.alias("n_files"),
        F.round(F.sum((style == "tabs").cast("int")) / n, 6)
        .alias("tabs_share"),
        F.round(F.sum((style == "spaces").cast("int")) / n, 6)
        .alias("spaces_share"),
        F.round(F.sum((style == "mixed").cast("int")) / n, 6)
        .alias("mixed_share"),
    )


def complexity_by_lang(
    df: DataFrame,
    content_col: str,
    lang_col: str,
    *,
    syntax: dict[str, tuple[tuple[str, ...], bool]] | None = None,
    tab_width: int = TAB_WIDTH,
) -> DataFrame:
    """Per-lang rollup ``(lang, n_files, total_decisions,
    avg_cyclomatic, max_cyclomatic, max_indent)`` — one
    map-side-combinable groupBy over the lang vocabulary (a handful of
    groups at any corpus size; nothing shuffles at file grain)."""
    st = complexity_stats(
        df,
        content_col,
        lang_col,
        keep_cols=[lang_col],
        syntax=syntax,
        tab_width=tab_width,
    )
    return st.groupBy(F.lower(F.coalesce(F.col(lang_col), F.lit(""))).alias(
        "lang"
    )).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.col("n_decisions") + F.col("n_bool_ops")).alias(
            "total_decisions"
        ),
        F.round(F.avg("cyclomatic"), 6).alias("avg_cyclomatic"),
        F.max("cyclomatic").alias("max_cyclomatic"),
        F.max("max_indent").alias("max_indent"),
    )
