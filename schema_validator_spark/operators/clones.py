"""Type-2 (identifier/literal-blind) code-clone detection — the tier
between exact content-sha dedup (type-1; operators/dedup.py,
operators/curatecode.py) and winnowing fingerprints (copied-block /
type-3-ish; operators/winnow.py).  Two files are type-2 clones when
they differ ONLY in identifier names, literal values, comments, and
whitespace — the "Deja Vu" (Lopes et al. 2017, file-hash map of GitHub
duplication) and SourcererCC token-normalization family.  A rename-only
fork copy hashes identically here while every sha/exact tier misses it.

Normalization is a fixed, ordered, RE2-safe regexp_replace chain (the
single source of truth the oracle replays verbatim):

1. string literals -> ``S_TOK`` (triple-quoted first, then
   single-line double/single quoted; protects ``//`` inside URLs from
   the comment step),
2. comments stripped per lang (codequality.COMMENT_SYNTAX — the same
   syntactic tier and caveats as comment_stats),
3. numeric literals (int/float/hex/exponent) -> ``N_TOK``,
4. identifiers (ASCII word starting with letter/underscore, keywords
   INCLUDED — the blind variant; consistent alpha-renaming needs
   per-doc state and is deliberately out of the codegen tier) ->
   ``I_TOK``,
5. whitespace runs -> one space, trimmed.

The class tokens are non-ASCII PUNCTUATION/SYMBOL characters (Po/Sc):
Java's ``\\b`` is Unicode-aware (any letter/digit/mark is a word char
— a superscript-letter placeholder would suppress the boundary in
Spark but not in RE2), while RE2's is ASCII; a punctuation placeholder
is a non-word char under BOTH definitions, so later steps see the same
boundaries in both engines and can never re-match an earlier step's
placeholder.

Scale shape: the whole normalization + md5 rides the scan (pure
codegen, zero Python); the ONLY shuffle is one hash partition on the
16-byte clone key (same shape as exact sha dedup).  The group-grain
summary is a map-side-combinable aggregation; member rows join the
filtered family dim back (AQE-broadcastable, skew-splittable) rather
than windowing over the key — see type2_clone_members.

Reference anchor: the reference validates single structs and has no
corpus-dedup analog; this extends SURVEY.md §2.9's dedup family along
the clone-granularity axis (rule registry parity is untouched).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .codequality import COMMENT_SYNTAX

#: class tokens — Unicode punctuation/symbol, non-word under BOTH
#: Java's Unicode \b and RE2's ASCII \b (see module doc)
S_TOK = "§"  # string literal
N_TOK = "¤"  # numeric literal
I_TOK = "¶"  # identifier

#: string-literal patterns, applied in order (triple-quoted first so a
#: docstring is one token, not an empty pair + body)
STRING_PATTERNS: tuple[str, ...] = (
    r'(?s)""".*?"""',
    r"(?s)'''.*?'''",
    r'"[^"\n]*"',
    r"'[^'\n]*'",
)
#: int / float / hex / underscore-grouped / exponent literals.  Hex is
#: its own branch so the decimal branch's class stops before 'e' and
#: the signed exponent can match ('1e+3' is ONE literal, not N+N) and
#: hex letters can't swallow a following identifier ('1.fee' and
#: '1.foo' both normalize to the same shape).
NUMBER_PATTERN = r"\b(?:0[xX][\dA-Fa-f_]+|\d[\d_.]*(?:[eE][+-]?\d+)?)"
#: ASCII identifier, keywords included (blind normalization)
IDENT_PATTERN = r"\b[A-Za-z_][A-Za-z0-9_]*"


def normalize_type2(
    content_col: str,
    lang_col: str,
    *,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> Column:
    """String Column: the type-2 normal form of ``content_col`` (empty
    string when nothing but comments/whitespace remains)."""
    syn = syntax if syntax is not None else COMMENT_SYNTAX
    s = F.coalesce(F.col(content_col), F.lit(""))
    for pat in STRING_PATTERNS:
        s = F.regexp_replace(s, pat, S_TOK)

    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    chain = None
    for lg, (line_pat, blk_pat) in sorted(syn.items()):
        stripped = s
        if blk_pat:
            stripped = F.regexp_replace(stripped, blk_pat, "")
        stripped = F.regexp_replace(stripped, line_pat, "")
        cond = lang == lg
        chain = (
            F.when(cond, stripped)
            if chain is None
            else chain.when(cond, stripped)
        )
    s = chain.otherwise(s) if chain is not None else s

    s = F.regexp_replace(s, NUMBER_PATTERN, N_TOK)
    s = F.regexp_replace(s, IDENT_PATTERN, I_TOK)
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


def type2_clone_members(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    min_group: int = 2,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Row-level clone membership: ``(id_cols..., clone_key,
    group_size)`` for every file in a type-2 family of at least
    ``min_group`` members.  Files whose normal form is empty (blank or
    comment-only) are excluded — every empty file would otherwise be
    one giant vacuous family.

    Shape: group sizes come from a map-side-combinable groupBy joined
    back onto the keyed rows — NOT a window.  A window over clone_key
    must buffer a whole family in one task, and the realistic
    degenerate input (one boilerplate file vendored 10M times) makes
    that a hot partition no planner can split; the join's fact-side
    skew is AQE-splittable, and the family dim (filtered to
    ``>= min_group`` BEFORE the join) is family-count sized — small
    enough that AQE usually broadcasts it, leaving the fact side
    un-shuffled."""
    if not id_cols:
        raise ValueError("type2_clone_members needs id columns")
    if min_group < 2:
        raise ValueError("min_group must be >= 2")
    norm = normalize_type2(content_col, lang_col, syntax=syntax)
    keyed = (
        df.select(*id_cols, norm.alias("_norm"))
        .filter(F.length("_norm") > 0)
        .select(*id_cols, F.md5(F.col("_norm")).alias("clone_key"))
    )
    fams = (
        keyed.groupBy("clone_key")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") >= min_group)
    )
    return keyed.join(fams, "clone_key").select(
        *id_cols, "clone_key", "group_size"
    )


def type2_clone_groups(
    df: DataFrame,
    id_col: str,
    content_col: str,
    lang_col: str,
    *,
    repo_col: str | None = None,
    min_group: int = 2,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Group-grain summary: ``(clone_key, n_files[, n_repos],
    representative)`` per type-2 family of at least ``min_group``
    files; ``representative`` is the family's minimal ``id_col`` (a
    deterministic exemplar).  Cross-repo families (``n_repos > 1``)
    are the vendored/forked-code signal.  One map-side-combinable
    groupBy on the clone key — output is family-count sized."""
    if min_group < 2:
        raise ValueError("min_group must be >= 2")
    norm = normalize_type2(content_col, lang_col, syntax=syntax)
    cols = [F.col(id_col)] + ([F.col(repo_col)] if repo_col else [])
    keyed = (
        df.select(*cols, norm.alias("_norm"))
        .filter(F.length("_norm") > 0)
        .select(*cols, F.md5(F.col("_norm")).alias("clone_key"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_files"),
        F.min(id_col).alias("representative"),
    ]
    if repo_col:
        aggs.insert(1, F.countDistinct(repo_col).alias("n_repos"))
    return (
        keyed.groupBy("clone_key")
        .agg(*aggs)
        .filter(F.col("n_files") >= min_group)
    )
