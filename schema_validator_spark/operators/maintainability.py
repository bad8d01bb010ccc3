"""Maintainability index over the (repo, path, commit, lang, content)
source-code table — the classic composite of the two metric layers this
engine already derives independently:

``MI_raw = 171 - 5.2*ln(V) - 0.23*CC - 16.2*ln(LOC)`` (Oman & Hagemeister
1992), rescaled to the familiar 0-100 band the Visual Studio variant
popularised: ``MI = max(0, 100 * MI_raw / 171)``.  Inputs:

- ``V``  — Halstead volume (operators/halstead.halstead_metrics);
- ``CC`` — the McCabe cyclomatic proxy, decisions + short-circuit
  operators + 1 (operators/complexity.complexity_stats);
- ``LOC`` — physical line count (``n_lines`` from the same pass; always
  >= 1, splitting "" yields one empty line, so ``ln`` is total).

``ln`` guards: ``V`` enters as ``greatest(V, 1.0)`` so empty files
(volume 0) score from the line/complexity terms instead of producing
``-inf``.  A corpus-quality gate thresholds on ``mi`` the same way the
reference's tag rules threshold scalar fields (rule/number.go ``min=``/
``max=``) — same engine, composed measurement layer.

Scale shape: strictly the union of the two component passes — one
full-coverage tokenization + one operator-char extraction (halstead)
and one decision/indent expression chain (complexity), all riding ONE
scan in whole-stage codegen; zero shuffles, zero joins, zero Python.
The composition costs nothing extra: ``complexity_stats`` runs over the
halstead output with ``volume`` carried through ``keep_cols``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .complexity import TAB_WIDTH, complexity_stats
from .halstead import halstead_metrics

#: Oman & Hagemeister coefficients (single source of truth for the
#: oracle): intercept, volume, cyclomatic, LOC
MI_COEFFS = (171.0, 5.2, 0.23, 16.2)


def maintainability_index(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    keywords: dict[str, tuple[str, ...]] | None = None,
    syntax: dict[str, tuple[tuple[str, ...], bool]] | None = None,
    tab_width: int = TAB_WIDTH,
) -> DataFrame:
    """Per-file ``(id_cols..., lang, volume, cyclomatic, n_lines, mi)``
    — ``mi`` is the 0-100 rescaled maintainability index (double)."""
    h = halstead_metrics(
        df.select(*id_cols, lang_col, content_col),
        id_cols,
        content_col,
        lang_col,
        keywords=keywords,
    )
    c = complexity_stats(
        h,
        content_col,
        lang_col,
        keep_cols=[*id_cols, lang_col, "volume"],
        syntax=syntax,
        tab_width=tab_width,
    )
    a0, av, ac, al = MI_COEFFS
    raw = (
        F.lit(a0)
        - F.lit(av) * F.log(F.greatest(F.col("volume"), F.lit(1.0)))
        - F.lit(ac) * F.col("cyclomatic")
        - F.lit(al) * F.log(F.col("n_lines").cast("double"))
    )
    mi = F.greatest(F.lit(0.0), F.lit(100.0) * raw / F.lit(a0))
    return c.select(
        *id_cols,
        lang_col,
        "volume",
        "cyclomatic",
        "n_lines",
        mi.alias("mi"),
    )
