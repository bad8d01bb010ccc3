"""Identifier extraction and subtoken vocabulary over source code —
the code-payload counterpart of functions/text.py's word vocabulary
(identifier subtokens are the standard code-model vocabulary signal:
Allamanis et al., "Mining Source Code Repositories at Massive Scale",
and every BPE-for-code paper since).

Pipeline: lex identifiers with one RE2-safe regex, drop the lang's
reserved keywords (exact match — identifiers are case-sensitive),
split camelCase / PascalCase / snake_case / SCREAMING_CASE into
lowercase subtokens via two backreference-free boundary rewrites
(acronym boundary first, so ``parseHTTPResponse`` ->
``parse,http,response`` not ``parse,httpr,esponse``).

Scale shape: extraction + keyword filter + subtoken split are all
per-row codegen expressions riding the scan (regexp_extract_all,
array_except against a literal keyword array, two regexp_replace, one
split) — zero shuffles until the vocabulary groupBy, which is
map-side-combinable at (subtoken) scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one lexer for every C-family tongue; RE2-safe
IDENTIFIER_RE = r"[A-Za-z_][A-Za-z0-9_]*"

#: reserved words excluded per language (exact, case-sensitive).
#: Deliberately the high-frequency core, not the full grammar — a
#: missed keyword inflates one vocabulary row, it never corrupts the
#: split.  Single source of truth for the oracle.
KEYWORDS: dict[str, tuple[str, ...]] = {
    "py": (
        "def", "class", "return", "import", "from", "if", "elif",
        "else", "for", "while", "in", "not", "and", "or", "is", "None",
        "True", "False", "with", "as", "try", "except", "finally",
        "raise", "pass", "lambda", "yield", "async", "await", "global",
        "nonlocal", "del", "assert", "break", "continue", "self",
    ),
    "go": (
        "func", "type", "struct", "interface", "map", "chan", "go",
        "defer", "return", "if", "else", "for", "range", "switch",
        "case", "default", "break", "continue", "package", "import",
        "var", "const", "nil", "true", "false", "select", "fallthrough",
        "goto", "string", "int", "int64", "float64", "bool", "byte",
        "error", "make", "new", "len", "cap", "append",
    ),
    "js": (
        "function", "class", "return", "import", "from", "export",
        "if", "else", "for", "while", "in", "of", "new", "delete",
        "typeof", "instanceof", "null", "undefined", "true", "false",
        "var", "let", "const", "this", "switch", "case", "default",
        "break", "continue", "try", "catch", "finally", "throw",
        "async", "await", "yield", "void", "do", "extends", "super",
    ),
}
KEYWORDS["ts"] = KEYWORDS["js"]


def split_subtokens(col: Column) -> Column:
    """array<string> of lowercase subtokens of one identifier:
    ``parseHTTPResponse_v2`` -> ``[parse, http, response, v2]``.
    Acronym boundary (``HTTPRe`` -> ``HTTP_Re``) rewrites before the
    lower-to-upper boundary; leading/trailing/doubled underscores
    yield no empty subtokens."""
    acr = F.regexp_replace(col, r"([A-Z]+)([A-Z][a-z])", r"$1_$2")
    camel = F.regexp_replace(acr, r"([a-z0-9])([A-Z])", r"$1_$2")
    return F.filter(
        F.split(F.lower(camel), "_+", -1), lambda t: t != ""
    )


def extract_identifiers(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    keywords: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """``(id_cols..., identifier)`` — one row per identifier token
    (multiplicity preserved), with the row's lang's reserved words
    removed.  Langs with no keyword list keep every token (extraction
    is lang-agnostic; only the stop-list is per-lang)."""
    kw = keywords if keywords is not None else KEYWORDS
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    toks = F.regexp_extract_all(s, F.lit(IDENTIFIER_RE), 0)
    chain = None
    for lg, words in sorted(kw.items()):
        arr = F.array(*[F.lit(w) for w in words])
        cond = lang == lg
        kwarr = F.when(cond, arr) if chain is None else chain.when(cond, arr)
        chain = kwarr
    stop = (
        chain.otherwise(F.array().cast("array<string>"))
        if chain is not None
        else F.array().cast("array<string>")
    )
    # per-token membership test against the tiny literal keyword array
    kept = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return df.select(*id_cols, F.explode(kept).alias("identifier"))


def identifier_vocabulary(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    keywords: dict[str, tuple[str, ...]] | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Subtoken vocabulary ``(subtoken, n_occ, n_identifiers)``:
    total occurrences and distinct source identifiers per lowercase
    subtoken.  One map-side-combinable groupBy at vocabulary scale
    (Heaps-law bounded, like functions/text.py's word vocabulary)."""
    ids = extract_identifiers(
        df, id_cols, content_col, lang_col, keywords=keywords
    )
    sub = ids.select(
        "identifier",
        F.explode(split_subtokens(F.col("identifier"))).alias("subtoken"),
    )
    out = sub.groupBy("subtoken").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("identifier").alias("n_identifiers"),
    )
    if min_count > 1:
        out = out.filter(F.col("n_occ") >= min_count)
    return out


# ------------------------------------------------------- casing profile

#: disjoint casing classes in priority order (single source of truth
#: for the oracle).  ``pascal`` is the only class needing a second
#: (negated) pattern — ``ABC`` matches the Pascal shape too, so Pascal
#: = shape minus the all-caps class.  RE2-safe: no lookahead.
CASING_UPPER_RE = r"^[A-Z][A-Z0-9_]*$"
CASING_PASCAL_RE = r"^[A-Z][A-Za-z0-9]*$"
CASING_SNAKE_RE = r"^[a-z][a-z0-9]*(_[a-z0-9]+)+$"
CASING_CAMEL_RE = r"^[a-z][a-z0-9]*([A-Z][A-Za-z0-9]*)+$"
CASING_LOWER_RE = r"^[a-z][a-z0-9]*$"


def casing_profile(
    df: DataFrame,
    content_col: str,
    lang_col: str,
    *,
    keywords: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Per-lang identifier-casing mix: ``(lang, n_ids, n_upper,
    n_pascal, n_snake, n_camel, n_lower, n_other, snake_share,
    camel_share, pascal_share)`` — the naming-convention consistency
    signal (a py corpus should be snake-heavy, js camel-heavy; a
    violated mix flags mislabeled or machine-generated files).

    Classes partition the identifier space: SCREAMING/all-caps,
    PascalCase, snake_case (>=1 underscore, all lower), camelCase
    (>=1 interior cap, no underscore), bare lowercase, other (leading
    underscore, mixed forms).  Shares use snake+camel+pascal over
    ``n_ids`` rounded 6dp; NULL when a lang has zero identifiers.

    Scale shape: tokenization + keyword filter + five class counts are
    per-row codegen expressions (no explode — counts pre-aggregate in
    the row), then ONE map-side-combinable groupBy over the tiny lang
    vocabulary.
    """
    kw = keywords if keywords is not None else KEYWORDS
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    toks = F.regexp_extract_all(s, F.lit(IDENTIFIER_RE), 0)
    chain = None
    for lg, words in sorted(kw.items()):
        arr = F.array(*[F.lit(w) for w in words])
        cond = lang == lg
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    stop = (
        chain.otherwise(F.array().cast("array<string>"))
        if chain is not None
        else F.array().cast("array<string>")
    )
    base = df.select(
        lang.alias("lang"),
        F.filter(toks, lambda t: ~F.array_contains(stop, t)).alias("_ids"),
    )

    def _n(pat: str):
        return F.size(F.filter("_ids", lambda t: t.rlike(pat)))

    n_upper = _n(CASING_UPPER_RE)
    n_pascal = F.size(
        F.filter(
            "_ids",
            lambda t: t.rlike(CASING_PASCAL_RE)
            & ~t.rlike(CASING_UPPER_RE),
        )
    )
    per_row = base.select(
        "lang",
        F.size("_ids").alias("_n"),
        n_upper.alias("_u"),
        n_pascal.alias("_p"),
        _n(CASING_SNAKE_RE).alias("_s"),
        _n(CASING_CAMEL_RE).alias("_c"),
        _n(CASING_LOWER_RE).alias("_l"),
    )
    agg = per_row.groupBy("lang").agg(
        F.sum("_n").alias("n_ids"),
        F.sum("_u").alias("n_upper"),
        F.sum("_p").alias("n_pascal"),
        F.sum("_s").alias("n_snake"),
        F.sum("_c").alias("n_camel"),
        F.sum("_l").alias("n_lower"),
    )
    n = F.col("n_ids")
    other = n - sum(
        (F.col(c) for c in ("n_pascal", "n_snake", "n_camel", "n_lower")),
        F.col("n_upper"),
    )
    share = lambda c: F.when(n > 0, F.round(F.col(c) / n, 6))  # noqa: E731
    return agg.select(
        "lang",
        "n_ids",
        "n_upper",
        "n_pascal",
        "n_snake",
        "n_camel",
        "n_lower",
        other.alias("n_other"),
        share("n_snake").alias("snake_share"),
        share("n_camel").alias("camel_share"),
        share("n_pascal").alias("pascal_share"),
    )
