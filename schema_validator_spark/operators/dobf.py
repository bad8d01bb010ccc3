"""DOBF-style identifier obfuscation pairs over source code — the
deobfuscation pretraining objective (Lachaux et al. 2021, "DOBF: A
Deobfuscation Pre-Training Objective for Programming Languages"):
every non-keyword identifier in a file is renamed to ``VAR_k`` in
first-appearance order, and the (obfuscated source, mapping) pair is
the training example — the model learns to recover the names.

Reference parity note: the reference engine (weilence/schema-validator)
has no code-corpus axis; this is an engine extension on the north-rule
input table (repo, path, commit, lang, content), reusing the keyword
stop-lists that functions/identifiers.py already single-sources for
the vocabulary operator.

Tokenization is a FULL-COVERAGE lexer: every character of the content
lands in exactly one token (identifier run | digit run | other run),
so re-concatenating the token stream reproduces the input byte-exactly
— renaming is therefore provably lossless outside the renamed
identifiers (pinned in tests).

Scale shape: zero shuffles — tokenization, the distinct-identifier
list, the placeholder map, and the rebuild are all per-row expressions
riding the scan.  The heavy derivations (``_toks``, ``_ids``,
``_map``) are materialized as explicit columns ONCE (interpreted HOFs
are CodegenFallback and never CSE — see CLAUDE.md); the rebuild does
ONE map lookup per token, so per-row cost is O(tokens x min(distinct
identifiers, max_ids)) with ``max_ids`` bounding the product on
pathological generated files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.identifiers import KEYWORDS

#: full-coverage lexer: identifier run | digit run | non-word run.
#: Alternation order matters only for the first char, and the three
#: first-char classes are disjoint, so the tokenization is unique.
#: ASCII-only classes: identical under Java regex (Spark) and RE2
#: (DuckDB oracle).
TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^A-Za-z0-9_]+"

#: a token is an identifier iff its first char is a letter/underscore
#: (guaranteed by the lexer's alternation shape)
_ID_HEAD_RE = r"^[A-Za-z_]"


def _keyword_array(lang_col: Column, keywords: dict[str, tuple[str, ...]]) -> Column:
    """Per-lang literal keyword array (empty for unregistered langs)."""
    expr = F.array().cast("array<string>")
    for lg, words in sorted(keywords.items()):
        arr = F.array(*[F.lit(w) for w in words])
        expr = F.when(lang_col == lg, arr).otherwise(expr)
    return expr


def obfuscate_identifiers(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    prefix: str = "VAR_",
    max_ids: int = 512,
    keywords: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Adds the DOBF pair columns to ``df``:

    - ``obf_content`` — content with every eligible identifier renamed
      to ``{prefix}{k}``, k = first-appearance rank (0-based);
    - ``id_names`` — array<string>, the original names in placeholder
      order (``id_names[k]`` is what ``{prefix}k`` stood for);
    - ``n_ids`` — renamed distinct identifiers (= size(id_names));
    - ``n_ids_total`` — distinct eligible identifiers BEFORE the
      ``max_ids`` cap (``> n_ids`` flags a truncated mapping);
    - ``n_tokens`` — lexer tokens in the file.

    Eligible = lexer identifier token not in the lang's keyword
    stop-list (unregistered langs have no stop-list: everything
    renames, which is DOBF's actual behavior for unknown tongues).
    Identifiers beyond ``max_ids`` distinct names keep their original
    spelling — a documented truncation, never a corruption.
    """
    if max_ids <= 0:
        raise ValueError("max_ids must be >= 1")
    kw = KEYWORDS if keywords is None else keywords
    kw_arr = _keyword_array(F.col(lang_col), kw)
    content = F.coalesce(F.col(content_col), F.lit(""))

    d = df.withColumn("_toks", F.regexp_extract_all(content, F.lit(TOKEN_RE), 0))
    d = d.withColumn("_kw", kw_arr)
    ids_all = F.array_distinct(
        F.filter(
            "_toks",
            lambda t: t.rlike(_ID_HEAD_RE) & ~F.array_contains(F.col("_kw"), t),
        )
    )
    d = d.withColumn("_ids_all", ids_all)
    d = d.withColumn("_ids", F.slice("_ids_all", 1, max_ids))
    # one placeholder map per row; element_at(map, tok) is a single
    # bounded scan per token (vs array_position re-evaluated per branch)
    d = d.withColumn(
        "_map",
        F.map_from_arrays(
            "_ids",
            F.transform(
                "_ids", lambda x, i: F.concat(F.lit(prefix), i.cast("string"))
            ),
        ),
    )
    d = d.withColumn(
        "obf_content",
        F.concat_ws(
            "",
            F.transform(
                "_toks", lambda t: F.coalesce(F.element_at(F.col("_map"), t), t)
            ),
        ),
    )
    return (
        d.withColumn("id_names", F.col("_ids"))
        .withColumn("n_ids", F.size("_ids"))
        .withColumn("n_ids_total", F.size("_ids_all"))
        .withColumn("n_tokens", F.size("_toks"))
        .drop("_toks", "_kw", "_ids_all", "_ids", "_map")
    )
